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
from .synthetic import FRAME_RANGE, INTENSITY_RANGE, MAX_SOURCES, SOURCE_MARGIN

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

        if cache_path and os.path.exists(cache_path):
            with np.load(cache_path) as f:
                seqs, chaos = f["sequences"], f["chaos"]
        else:
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
            seq_chunks, lab_chunks = [], []
            for start in range(0, num_samples, chunk_size):
                end = min(start + chunk_size, num_samples)
                s, l = episode(
                    params["xyz"][start:end],
                    params["intensity"][start:end],
                    params["active"][start:end],
                )
                seq_chunks.append(np.asarray(s))
                lab_chunks.append(np.asarray(l))
            seqs = np.concatenate(seq_chunks)
            chaos = np.concatenate(lab_chunks)
            if cache_path:
                os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
                np.savez(cache_path, sequences=seqs, chaos=chaos)

        self._sequences = jnp.asarray(seqs)
        self._chaos = jnp.asarray(chaos)

    def __len__(self) -> int:
        return self._sequences.shape[0]

    def sample_batch(self, key: Array, batch_size: int) -> Dict[str, Array]:
        k1, k2 = jax.random.split(key)
        idx = jax.random.randint(k1, (batch_size,), 0, len(self))
        frames = jax.random.randint(
            k2, (batch_size,), FRAME_RANGE[0],
            self.sequence_length + FRAME_RANGE[1],
        )
        seqs = self._sequences[idx]  # [B, T, D, H, W]
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
