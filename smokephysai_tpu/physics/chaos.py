"""Chaos features: Lyapunov exponent, box-counting fractal dimension,
Shannon entropy — fully on-device and jit/vmap-friendly.

Re-design of reference src/physics/smoke_simulator.py:47-140. The reference
computes the box count with a Python double loop (smoke_simulator.py:100-115)
and the entropy histogram on the CPU (smoke_simulator.py:134-135); here both
are vectorised XLA ops (reshape-reduce box count, bincount histogram), so a
whole trajectory's features compile into one fused program.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

BOX_SCALES: Tuple[int, ...] = (2, 4, 8, 16, 32)  # reference smoke_simulator.py:100
LYAPUNOV_WINDOW = 20  # reference smoke_simulator.py:69-73
HISTOGRAM_BINS = 256  # reference smoke_simulator.py:135


def lyapunov_exponent(states: Array) -> Array:
    """Mean log-divergence rate of the last `LYAPUNOV_WINDOW` states
    (reference smoke_simulator.py:67-87).

    states: [T, H, W] with T >= LYAPUNOV_WINDOW (caller slices the window).
    Equals mean(diff(log(||s[t+1]-s[t]|| + 1e-8))), clamped >= 0.
    """
    window = states[-LYAPUNOV_WINDOW:]
    diffs = window[1:] - window[:-1]
    # Frobenius norm per step over all non-time axes (2D frames or 3D volumes)
    dists = jnp.sqrt(jnp.sum(diffs**2, axis=tuple(range(1, diffs.ndim))))
    log_d = jnp.log(dists + 1e-8)
    lyap = jnp.mean(log_d[1:] - log_d[:-1])
    return jnp.maximum(0.0, lyap)


def box_count(binary: Array, scale: int) -> Array:
    """Number of scale^d boxes containing any positive cell; truncates the
    remainder rows/cols like the reference's integer-division loop
    (reference smoke_simulator.py:103-115). Works for 2D frames and 3D
    volumes (the volumetric config extends the same box-counting)."""
    if binary.ndim == 2:
        h, w = binary.shape
        bh, bw = h // scale, w // scale
        cropped = binary[: bh * scale, : bw * scale]
        sums = cropped.reshape(bh, scale, bw, scale).sum(axis=(1, 3))
    else:
        d, h, w = binary.shape
        bd, bh, bw = d // scale, h // scale, w // scale
        cropped = binary[: bd * scale, : bh * scale, : bw * scale]
        sums = cropped.reshape(bd, scale, bh, scale, bw, scale).sum(
            axis=(1, 3, 5)
        )
    return jnp.sum(sums > 0).astype(jnp.float32)


def fractal_dimension(frame: Array, scales: Sequence[int] = BOX_SCALES) -> Array:
    """Box-counting dimension: |slope| of log(count+1) vs log(scale)
    (reference smoke_simulator.py:89-124). Binarisation threshold is the
    frame mean (smoke_simulator.py:97)."""
    binary = (frame > jnp.mean(frame)).astype(jnp.float32)
    counts = jnp.stack([box_count(binary, s) for s in scales])
    log_scales = jnp.log(jnp.asarray(scales, jnp.float32))
    log_counts = jnp.log(counts + 1.0)
    # degree-1 polyfit slope in closed form
    xm = jnp.mean(log_scales)
    ym = jnp.mean(log_counts)
    slope = jnp.sum((log_scales - xm) * (log_counts - ym)) / jnp.sum(
        (log_scales - xm) ** 2
    )
    return jnp.abs(slope)


def shannon_entropy(frame: Array, bins: int = HISTOGRAM_BINS) -> Array:
    """Shannon entropy (base 2) of a 256-bin histogram over [0, 1]
    (reference smoke_simulator.py:126-140). Values outside [0, 1] are
    excluded, matching torch.histogram's range semantics; the closed right
    edge maps 1.0 into the last bin."""
    x = frame.reshape(-1)
    valid = (x >= 0.0) & (x <= 1.0)
    idx = jnp.clip(jnp.floor(x * bins).astype(jnp.int32), 0, bins - 1)
    counts = jnp.bincount(
        jnp.where(valid, idx, 0),
        weights=valid.astype(jnp.float32),
        length=bins,
    )
    probs = counts / jnp.sum(counts)
    return -jnp.sum(probs * jnp.log2(probs + 1e-8))


def chaos_features(history: Array, history_len: Array | int) -> Array:
    """Features of a rolling history buffer at one instant: [lyapunov,
    fractal_dimension, entropy] of `history[..., :history_len]`'s tail
    (reference smoke_simulator.py:47-65). `history` is a fixed-size [T,H,W]
    ring already ordered oldest->newest; lyapunov is 0 until 20 frames exist
    (smoke_simulator.py:69-70)."""
    history_len = jnp.asarray(history_len)
    lyap = jnp.where(
        history_len >= LYAPUNOV_WINDOW, lyapunov_exponent(history), 0.0
    )
    current = history[-1]
    return jnp.stack([lyap, fractal_dimension(current), shannon_entropy(current)])


def chaos_features_from_sequence(
    sequence: Array, warmup: int = 10
) -> Array:
    """Episode-averaged chaos label exactly as the reference data generator
    computes it (reference src/utils/data_loader.py:66-88):

    for each t >= `warmup`, collect [lyapunov_t, fd_t, entropy_t] where
    lyapunov_t is nonzero only once 20 frames of history exist
    (t >= 19), fd/entropy are computed on frame t; return the mean over t.

    sequence: [T, H, W] (perturbed densities). Fully vectorised: fd/entropy
    vmap over frames, lyapunov over sliding 20-frame windows.
    """
    T = sequence.shape[0]
    ts = jnp.arange(warmup, T)

    fd_ent = jax.vmap(
        lambda t: jnp.stack(
            [
                fractal_dimension(sequence[t]),
                shannon_entropy(sequence[t]),
            ]
        )
    )(ts)

    def lyap_at(t):
        window = lax.dynamic_slice_in_dim(
            sequence, t - (LYAPUNOV_WINDOW - 1), LYAPUNOV_WINDOW, axis=0
        )
        return jnp.where(
            t >= LYAPUNOV_WINDOW - 1, lyapunov_exponent(window), 0.0
        )

    if T < LYAPUNOV_WINDOW:
        # a 20-frame history never accumulates: lyapunov stays 0
        # (reference smoke_simulator.py:69-70)
        lyaps = jnp.zeros_like(ts, dtype=sequence.dtype)
    else:
        # clamp start index so dynamic_slice stays in bounds for t < 19
        lyaps = jax.vmap(lambda t: lyap_at(jnp.maximum(t, LYAPUNOV_WINDOW - 1)))(ts)
        lyaps = jnp.where(ts >= LYAPUNOV_WINDOW - 1, lyaps, 0.0)

    return jnp.concatenate(
        [jnp.mean(lyaps, keepdims=True), jnp.mean(fd_ent, axis=0)]
    )
