"""3D synthetic dataset for the volumetric config (BASELINE.json
configs[3]). Mirrors data/synthetic.py with volume episodes from
simulate_episode3d."""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smokephysai_tpu.physics.simulator3d import simulate_episode3d
from .synthetic import (
    FRAME_RANGE,
    INTENSITY_RANGE,
    MAX_SOURCES,
    SOURCE_MARGIN,
    _check_sequence_length,
    epoch_order_frames,
)

Array = jnp.ndarray


def sample_source_params3d(
    key: Array, num_samples: int, grid_size: Tuple[int, int, int]
) -> Dict[str, Array]:
    d, h, w = grid_size
    ks = jax.random.split(key, 5)
    num_sources = jax.random.randint(ks[0], (num_samples,), 1, MAX_SOURCES + 1)
    margin = min(SOURCE_MARGIN, min(grid_size) // 4)
    xs = jax.random.randint(
        ks[1], (num_samples, MAX_SOURCES), margin, w - margin
    ).astype(jnp.float32)
    ys = jax.random.randint(
        ks[2], (num_samples, MAX_SOURCES), margin, h - margin
    ).astype(jnp.float32)
    zs = jax.random.randint(
        ks[3], (num_samples, MAX_SOURCES), margin, d - margin
    ).astype(jnp.float32)
    intensity = jax.random.uniform(
        ks[4], (num_samples, MAX_SOURCES),
        minval=INTENSITY_RANGE[0], maxval=INTENSITY_RANGE[1],
    )
    active = (
        jnp.arange(MAX_SOURCES)[None, :] < num_sources[:, None]
    ).astype(jnp.float32)
    return {
        "xyz": jnp.stack([xs, ys, zs], axis=-1),
        "intensity": intensity,
        "active": active,
    }


class SyntheticSmokeDataset3D:
    """Volume episodes: input/target are consecutive [D,H,W] volumes plus
    the episode-averaged chaos label (same sampling semantics as 2D)."""

    DEVICE_BYTES_LIMIT = 4_000_000_000  # same policy as the 2D dataset

    def __init__(
        self,
        num_samples: int = 32,
        grid_size: Tuple[int, int, int] = (64, 64, 64),
        sequence_length: int = 20,
        cache_path: Optional[str] = None,
        seed: int = 0,
        chunk_size: int = 8,
    ):
        self.grid_size = tuple(grid_size)
        self.sequence_length = sequence_length
        _check_sequence_length(sequence_length)

        if cache_path and os.path.exists(cache_path):
            with np.load(cache_path) as f:
                seqs, chaos = f["sequences"], f["chaos"]
        else:
            # cap the vmapped working set: a 128^3 episode is ~100 MB of
            # sequence plus CG/chaos temporaries, so large volumes generate
            # one (or few) at a time instead of 8 (64^3-sized chunks crash
            # the single v5e at 128^3)
            voxels = int(np.prod(self.grid_size))
            chunk_size = max(1, min(chunk_size, (8 * 64**3) // voxels))
            params = sample_source_params3d(
                jax.random.PRNGKey(seed), num_samples, self.grid_size
            )
            episode = jax.jit(
                jax.vmap(
                    lambda xyz, inten, act: simulate_episode3d(
                        xyz, inten, act,
                        grid_size=self.grid_size,
                        num_steps=sequence_length,
                    )
                )
            )
            # Decide f16 device storage UP FRONT (predicted f32 bytes) and
            # cast each chunk host-side as it lands: the 64-episode 128^3
            # quality set is ~7 GB f32, and uploading f32 then casting on
            # device put a ~7 GB transient next to the 3.5 GB f16 copy —
            # the r5 train3dq OOM (RESOURCE_EXHAUSTED at the first epoch
            # gather). Host-side f16 also halves the tunnel upload.
            # episodes store num_steps frames (simulator3d.simulate_episode3d)
            pred_bytes = num_samples * sequence_length * voxels * 4
            gen_f16 = pred_bytes >= self.DEVICE_BYTES_LIMIT
            seq_chunks, lab_chunks = [], []
            for start in range(0, num_samples, chunk_size):
                end = min(start + chunk_size, num_samples)
                s, l = episode(
                    params["xyz"][start:end],
                    params["intensity"][start:end],
                    params["active"][start:end],
                )
                seq_chunks.append(
                    np.asarray(s).astype(np.float16) if gen_f16
                    else np.asarray(s)
                )
                lab_chunks.append(np.asarray(l))
            seqs = np.concatenate(seq_chunks)
            chaos = np.concatenate(lab_chunks)
            if cache_path:
                os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
                np.savez(cache_path, sequences=seqs, chaos=chaos)

        # f16 device storage beyond the f32 comfort limit (mirrors the 2D
        # dataset's policy, synthetic.py: the r4 on-device data path): a
        # 128^3 x T13 episode is ~109 MB f32, so the r4 quality ceiling was
        # ~32 episodes; f16 halves that to ~54 MB, letting the 3D quality
        # recipe scale data 2x (VERDICT r4 next #3, the proven 2D lever).
        # Batch gathers cast back to f32 — step numerics see only frame
        # quantisation (~6e-4 absolute on O(1) densities).
        # (generation above may already have produced f16; cache loads are
        # f32 and get the host-side cast here — never ship f32 over the
        # tunnel only to down-cast on device)
        self._seq_f16 = (
            seqs.dtype == np.float16
            or seqs.nbytes >= self.DEVICE_BYTES_LIMIT
        )
        if self._seq_f16 and seqs.dtype != np.float16:
            seqs = seqs.astype(np.float16)
        self._sequences = jnp.asarray(seqs)
        self._chaos = jnp.asarray(chaos)

    def __len__(self) -> int:
        return self._sequences.shape[0]

    def get_batch(self, idx: Array, frames: Array) -> Dict[str, Array]:
        seqs = self._sequences[idx]  # [B, T, D, H, W]
        if self._seq_f16:
            seqs = seqs.astype(jnp.float32)
        inp = jnp.take_along_axis(
            seqs, frames[:, None, None, None, None], axis=1
        )[:, 0, ..., None]
        tgt = jnp.take_along_axis(
            seqs, (frames + 1)[:, None, None, None, None], axis=1
        )[:, 0, ..., None]
        return {
            "input": inp,
            "target": tgt,
            "chaos_features": self._chaos[idx],
            "sequence": seqs,
        }

    def sample_batch(self, key: Array, batch_size: int) -> Dict[str, Array]:
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch_size,), 0, len(self))
        frames = jax.random.randint(
            k2, (batch_size,), FRAME_RANGE[0],
            self.sequence_length + FRAME_RANGE[1],
        )
        return self.get_batch(idx, frames)

    def epoch_batches(self, key: Array, batch_size: int, shuffle: bool = True):
        """One pass over all episodes (same semantics as the 2D dataset:
        shuffled epochs drop the ragged tail to keep jit shapes static;
        validation keeps it)."""
        n = len(self)
        order, frames = epoch_order_frames(
            key, n, self.sequence_length, shuffle
        )
        num_full = n // batch_size
        for b in range(num_full):
            idx = order[b * batch_size : (b + 1) * batch_size]
            yield self.get_batch(idx, frames[idx])
        if not shuffle and n % batch_size:
            idx = order[num_full * batch_size :]
            yield self.get_batch(idx, frames[idx])


def create_data_loaders3d(
    batch_size: int = 1,
    num_train: int = 16,
    num_val: int = 4,
    grid_size: Tuple[int, int, int] = (128, 128, 128),
    cache_dir: Optional[str] = None,
    sequence_length: int = 20,
    seed: int = 0,
) -> Tuple[SyntheticSmokeDataset3D, SyntheticSmokeDataset3D]:
    """Volumetric train/val datasets (BASELINE configs[3]); cache names
    encode the generation parameters like the 2D loader."""

    def cache_path(split: str, n: int, s: int) -> Optional[str]:
        if not cache_dir:
            return None
        d, h, w = grid_size
        return os.path.join(
            cache_dir, f"{split}3d_{d}x{h}x{w}_T{sequence_length}_n{n}_s{s}.npz"
        )

    train = SyntheticSmokeDataset3D(
        num_samples=num_train,
        grid_size=grid_size,
        sequence_length=sequence_length,
        cache_path=cache_path("train", num_train, seed),
        seed=seed,
    )
    val = SyntheticSmokeDataset3D(
        num_samples=num_val,
        grid_size=grid_size,
        sequence_length=sequence_length,
        cache_path=cache_path("val", num_val, seed + 1),
        seed=seed + 1,
    )
    return train, val
