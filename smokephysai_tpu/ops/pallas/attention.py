"""Blockwise (flash) attention Pallas kernel.

Single-chip counterpart of parallel/ring_attention.py (SURVEY.md §5
long-context plan: 'blockwise/flash attention as a Pallas kernel for long
single-device sequences'). Never materialises the [L, L] score matrix in
HBM: each (batch*head, q-block) program streams K/V blocks through VMEM
with an online-softmax accumulator, so HBM traffic is O(L*D) instead of
O(L^2).

Composes with chaos attention unchanged: the chaos term is folded into q
before the matmul (models/chaos_attention.py), so flash(q_eff, k, v) IS the
reference's gated two-matmul attention. Temperature is folded into the
scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import use_interpret

Array = jnp.ndarray

NEG_INF = -1e30


def _fused_bwd_enabled() -> bool:
    """Fused dq+dk+dv backward kernel (default on). TPU-validated
    2026-08-21: the head-major layout Mosaic-compiles and matches the
    split kernels to f32 rounding (dq exact, dk/dv ~1e-7 — scripts/
    check_fused_bwd_tpu.py on v5e); the head-looped ancestor measured
    trunk bwd 14.48 -> 11.92 ms (profile_train). Set SMOKEPHYS_FUSED_BWD=0
    to fall back to the split dq / dkv kernels (A/B timing, escape
    hatch)."""
    import os

    return os.environ.get("SMOKEPHYS_FUSED_BWD", "1") != "0"


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0]  # [BQ, D] (leading dim is the size-1 batch*head block)
    _, L, D = k_ref.shape
    num_kb = L // block_k

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [BQ, BK]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l

    BQ = q.shape[0]
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc, _, l = lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "temperature")
)
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    temperature: float = 1.0,
    block_q: int = 256,
    block_k: int = 512,
) -> Array:
    """softmax(q k^T / (sqrt(D)*temperature)) v for [B, H, L, D] inputs.
    L must divide by the block sizes (the model's 1024-token grid does)."""
    B, H, L, D = q.shape
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    assert L % block_q == 0 and L % block_k == 0
    scale = 1.0 / (float(D) ** 0.5 * temperature)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=(B * H, L // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        interpret=use_interpret(),
    )(qf, kf, vf)
    return out.reshape(B, H, L, D)


# --------------------------------------------------------------------------
# Trainable token-major flash attention (custom VJP).
#
# The einsum training path materialises the [B,H,L,L] f32 score matrix in
# HBM (256 MB at batch 8 / 1024 tokens) and its softmax backward lowers to
# VPU reduce fusions — profiling showed it at ~4 ms/layer, ~2/3 of the whole
# train step. Here the forward additionally emits the per-row logsumexp, and
# the backward is ONE Pallas program per batch element that recomputes
# P = exp(S - lse) head-by-head entirely in VMEM (L=1024, D=512: all five
# [L,D] operands plus one [L,L] f32 transient ≈ 15 MB) — the score matrix
# never touches HBM in either pass.
# --------------------------------------------------------------------------


def _flash_fwd_kernel_bld(
    q_ref, k_ref, v_ref, o_ref, lse_ref, *, num_heads: int, block_k: int,
    scale: float,
):
    """_flash_kernel_bld plus an lse output row per head ([1, H, BQ])."""
    _, L, D = k_ref.shape
    hd = D // num_heads
    num_kb = L // block_k
    q_all = q_ref[0]
    BQ = q_all.shape[0]

    for h in range(num_heads):
        q = q_all[:, h * hd : (h + 1) * hd]

        def body(kb, carry):
            acc, m, l = carry
            k_blk = k_ref[0, pl.ds(kb * block_k, block_k), h * hd : (h + 1) * hd]
            v_blk = v_ref[0, pl.ds(kb * block_k, block_k), h * hd : (h + 1) * hd]
            s = (
                jax.lax.dot_general(
                    q, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l

        acc0 = jnp.zeros((BQ, hd), jnp.float32)
        m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((BQ, 1), jnp.float32)
        acc, m, l = lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
        o_ref[0, :, h * hd : (h + 1) * hd] = (acc / l).astype(o_ref.dtype)
        lse_ref[0, h, :] = (m + jnp.log(l))[:, 0]


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, num_heads: int, scale: float,
):
    """dq for one (batch, q-block): standard flash backward identities
        P = exp(S - lse),  dP = dO V^T,  dS = P * (dP - delta)
        dQ = scale * dS K
    with delta = rowsum(dO * O) precomputed in XLA (one cheap reduce)."""
    q = q_ref[0]    # [BQ, D]
    k = k_ref[0]    # [L, D]
    v = v_ref[0]
    do = do_ref[0]  # [BQ, D]
    hd = q.shape[-1] // num_heads

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        s = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [BQ, L]
        p = jnp.exp(s - lse_ref[0, h, :][:, None])
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [BQ, L]
        ds = (p * (dp - delta_ref[0, h, :][:, None]) * scale).astype(q.dtype)
        dq_ref[0, :, sl] = jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, num_heads: int, scale: float,
):
    """dk/dv for one (batch, k-block):
        dV = P^T dO,  dK = scale * dS^T Q
    (P/dS recomputed over the full q range for this k block)."""
    q = q_ref[0]    # [L, D]
    k = k_ref[0]    # [BK, D]
    v = v_ref[0]
    do = do_ref[0]  # [L, D]
    hd = q.shape[-1] // num_heads

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh, kh, vh, doh = q[:, sl], k[:, sl], v[:, sl], do[:, sl]
        s = (
            jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [L, BK]
        p = jnp.exp(s - lse_ref[0, h, :][:, None])
        pb = p.astype(v.dtype)
        dv_ref[0, :, sl] = jax.lax.dot_general(
            pb, doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dv_ref.dtype)
        dp = jax.lax.dot_general(
            doh, vh, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [L, BK]
        ds = (p * (dp - delta_ref[0, h, :][:, None]) * scale).astype(q.dtype)
        dk_ref[0, :, sl] = jax.lax.dot_general(
            ds, qh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dk_ref.dtype)


def _flash_bwd_fused_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref, dk_ref, dv_ref, *, scale: float,
):
    """dq + dk + dv in ONE pass over grid (batch, head, q-block) — the
    split dq/dkv kernels each recompute S and dP (7 matmul units per
    head); sharing the recompute here is the theoretical 5 units.

    The head dim lives in the GRID, not a Python loop: an unrolled head
    loop made Mosaic stack-allocate the [BQ, L] recompute temporaries for
    several heads at once and blew the 16 MB scoped-vmem limit (19.03 MB
    at BQ=256, still 17.52 MB at BQ=128 — check_fused_bwd_tpu on v5e).
    Operands arrive HEAD-MAJOR [B, H, L, hd] (the wrapper transposes):
    Mosaic requires a block's last dim be 128-divisible or equal the
    array's, so per-head slices of a packed [B, L, D] layout (last dim
    hd=64) cannot be blocked — as the full last dim of a 4D layout they
    can. Per-head blocks keep the resident set a few hundred KB. dk/dv
    are f32 per-(batch, head) full-L accumulator blocks whose index map
    ignores the innermost q-block grid dim, so they stay VMEM-resident
    across the sequential i iterations and accumulate each q-block's
    contribution."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[...] = jnp.zeros_like(dk_ref)
        dv_ref[...] = jnp.zeros_like(dv_ref)

    q = q_ref[0, 0]    # [BQ, hd]
    k = k_ref[0, 0]    # [L, hd]
    v = v_ref[0, 0]
    do = do_ref[0, 0]  # [BQ, hd]
    lse = lse_ref[0, 0, 0, :]      # [BQ] (query rows of this block)
    delta = delta_ref[0, 0, 0, :]  # [BQ]
    s = (
        jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )  # [BQ, L]
    p = jnp.exp(s - lse[:, None])
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [BQ, L]
    ds = (p * (dp - delta[:, None]) * scale).astype(q.dtype)
    dq_ref[0, 0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dq_ref.dtype)
    dv_ref[0, 0] += jax.lax.dot_general(
        p.astype(v.dtype), do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dk_ref[0, 0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _flash_tokens_fwd_lse(q, k, v, num_heads, scale, block_q, block_k):
    B, L, D = q.shape
    out, lse = pl.pallas_call(
        functools.partial(
            _flash_fwd_kernel_bld, num_heads=num_heads, block_k=block_k,
            scale=scale,
        ),
        grid=(B, L // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, num_heads, block_q), lambda b, i: (b, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, L, D), q.dtype),
            jax.ShapeDtypeStruct((B, num_heads, L), jnp.float32),
        ],
        interpret=use_interpret(),
    )(q, k, v)
    return out, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _flash_tokens_diff(num_heads, temperature, block_q, block_k, q, k, v):
    # PRIMAL path: runs only when the call is NOT being differentiated
    # (custom_vjp swaps in _flash_trainable_fwd under vjp), i.e. serving.
    # Use the lean no-lse kernel here — routing inference through the
    # lse-emitting trainable forward cost the batch-64 flash path ~7%
    # (r2 1534 fps -> r4 1432; VERDICT r5 serving-regression bisect).
    return flash_attention_tokens(
        q, k, v, num_heads, temperature=temperature,
        block_q=block_q, block_k=block_k,
    )


def _flash_trainable_fwd(num_heads, temperature, block_q, block_k, q, k, v):
    B, L, D = q.shape
    scale = 1.0 / (float(D // num_heads) ** 0.5 * temperature)
    out, lse = _flash_tokens_fwd_lse(q, k, v, num_heads, scale, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_trainable_bwd(num_heads, temperature, block_q, block_k, res, g):
    q, k, v, out, lse = res
    B, L, D = q.shape
    hd = D // num_heads
    scale = 1.0 / (float(hd) ** 0.5 * temperature)

    # delta[b,h,l] = rowsum(dO * O) per head — one cheap XLA reduce
    delta = (
        (g.astype(jnp.float32) * out.astype(jnp.float32))
        .reshape(B, L, num_heads, hd)
        .sum(axis=-1)
        .transpose(0, 2, 1)
    )  # [B, H, L]

    full = pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                        memory_space=pltpu.VMEM)
    hl_full = pl.BlockSpec((1, num_heads, L), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    qblk = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    hl_qblk = pl.BlockSpec((1, num_heads, block_q), lambda b, i: (b, 0, i),
                           memory_space=pltpu.VMEM)

    if _fused_bwd_enabled():
        # one fused pass: S/dP recomputed once per q-block instead of once
        # per kernel (5 matmul units/head vs the split kernels' 7). Heads
        # ride the grid in a HEAD-MAJOR [B, H, L, hd] layout (see kernel
        # docstring: an unrolled head loop blew scoped VMEM, and per-head
        # blocks of the packed token-major layout violate Mosaic's
        # last-dim-divisible-by-128 block rule). The transposes cost
        # ~56 MB of HBM traffic (~0.1 ms) against the ~2.5 ms the shared
        # recompute saves. Per-(batch, head) f32 dk/dv accumulator blocks
        # are revisited across the sequential q-block iterations.
        hd = D // num_heads

        def hmajor(x):
            return x.reshape(B, L, num_heads, hd).transpose(0, 2, 1, 3)

        h_qblk = pl.BlockSpec((1, 1, block_q, hd),
                              lambda b, h, i: (b, h, i, 0),
                              memory_space=pltpu.VMEM)
        h_full = pl.BlockSpec((1, 1, L, hd), lambda b, h, i: (b, h, 0, 0),
                              memory_space=pltpu.VMEM)
        h_lse = pl.BlockSpec((1, 1, 1, block_q),
                             lambda b, h, i: (b, h, 0, i),
                             memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_flash_bwd_fused_kernel, scale=scale),
            grid=(B, num_heads, L // block_q),
            in_specs=[h_qblk, h_full, h_full, h_qblk, h_lse, h_lse],
            out_specs=[h_qblk, h_full, h_full],
            out_shape=[
                jax.ShapeDtypeStruct((B, num_heads, L, hd), q.dtype),
                jax.ShapeDtypeStruct((B, num_heads, L, hd), jnp.float32),
                jax.ShapeDtypeStruct((B, num_heads, L, hd), jnp.float32),
            ],
            interpret=use_interpret(),
        )(
            hmajor(q), hmajor(k), hmajor(v), hmajor(g),
            lse.reshape(B, num_heads, 1, L),
            delta.reshape(B, num_heads, 1, L),
        )

        def tmajor(x, dtype):
            return x.transpose(0, 2, 1, 3).reshape(B, L, D).astype(dtype)

        return (
            tmajor(dq, q.dtype), tmajor(dk, k.dtype), tmajor(dv, v.dtype)
        )

    dq = pl.pallas_call(
        functools.partial(
            _flash_bwd_dq_kernel, num_heads=num_heads, scale=scale
        ),
        grid=(B, L // block_q),
        in_specs=[qblk, full, full, qblk, hl_qblk, hl_qblk],
        out_specs=qblk,
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        interpret=use_interpret(),
    )(q, k, v, g, lse, delta)

    kblk = pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, num_heads=num_heads, scale=scale
        ),
        grid=(B, L // block_q),
        in_specs=[full, kblk, kblk, full, hl_full, hl_full],
        out_specs=[kblk, kblk],
        out_shape=[jax.ShapeDtypeStruct((B, L, D), q.dtype)] * 2,
        interpret=use_interpret(),
    )(q, k, v, g, lse, delta)
    return dq, dk, dv


_flash_tokens_diff.defvjp(_flash_trainable_fwd, _flash_trainable_bwd)


def flash_attention_tokens_trainable(
    q: Array, k: Array, v: Array, num_heads: int, temperature: float = 1.0,
    block_q: int = 256, block_k: int = 1024,
) -> Array:
    """`flash_attention_tokens` with a Pallas backward pass — safe under
    jax.grad, so `use_flash` works on the training path too (the [L, L]
    score matrix stays in VMEM in both passes)."""
    B, L, D = q.shape
    block_q, block_k = min(block_q, L), min(block_k, L)
    assert D % num_heads == 0 and L % block_q == 0 and L % block_k == 0
    return _flash_tokens_diff(num_heads, temperature, block_q, block_k, q, k, v)


def _flash_kernel_bld(
    q_ref, k_ref, v_ref, o_ref, *, num_heads: int, block_k: int, scale: float
):
    _, L, D = k_ref.shape
    hd = D // num_heads
    num_kb = L // block_k
    q_all = q_ref[0]  # [BQ, D]
    BQ = q_all.shape[0]

    for h in range(num_heads):  # static unroll; head = a column slice
        q = q_all[:, h * hd : (h + 1) * hd]

        def body(kb, carry):
            acc, m, l = carry
            k_blk = k_ref[0, pl.ds(kb * block_k, block_k), h * hd : (h + 1) * hd]
            v_blk = v_ref[0, pl.ds(kb * block_k, block_k), h * hd : (h + 1) * hd]
            s = (
                jax.lax.dot_general(
                    q, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l

        acc0 = jnp.zeros((BQ, hd), jnp.float32)
        m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((BQ, 1), jnp.float32)
        acc, _, l = lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
        o_ref[0, :, h * hd : (h + 1) * hd] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "block_k", "temperature")
)
def flash_attention_tokens(
    q: Array,
    k: Array,
    v: Array,
    num_heads: int,
    temperature: float = 1.0,
    block_q: int = 256,
    block_k: int = 1024,
) -> Array:
    """Multi-head flash attention straight on token-major [B, L, D]
    projections (D = num_heads * head_dim, torch head convention: head h is
    the column slice [h*hd, (h+1)*hd)). Heads are a static loop over column
    slices inside the kernel, so there are NO [B,L,H,hd]<->[B,H,L,hd]
    relayout transposes around the call — on v5e those run at ~120 GB/s and
    cost ~1 ms each at batch 64, which made them ~25% of a transformer
    layer. K/V for ALL heads stay VMEM-resident per (batch, q-block)
    program and are reused by every head's pass."""
    B, L, D = q.shape
    assert D % num_heads == 0
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    assert L % block_q == 0 and L % block_k == 0
    scale = 1.0 / (float(D // num_heads) ** 0.5 * temperature)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_bld, num_heads=num_heads, block_k=block_k, scale=scale
        ),
        grid=(B, L // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        interpret=use_interpret(),
    )(q, k, v)
    return out
