"""Device mesh construction.

The reference is strictly single-device (SURVEY.md §2.6: no DP/TP/PP/SP, no
communication backend). The TPU-native scaling story is a
`jax.sharding.Mesh` over ('data', 'model', 'space') axes with XLA
collectives over ICI:

  data  - batch/data parallelism (gradient psum inserted by the compiler)
  model - tensor parallelism over attention heads / FFN hidden
  space - spatial domain decomposition of the simulation grid
          (halo exchange via shard_map + ppermute, parallel/halo.py)
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh

AXES = ("data", "model", "space")


def make_mesh(
    data: int = 1,
    model: int = 1,
    space: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Mesh over the first data*model*space devices, axes ('data', 'model',
    'space'). Contiguous device order keeps each axis on an ICI ring."""
    devices = list(devices if devices is not None else jax.devices())
    needed = data * model * space
    if needed > len(devices):
        raise ValueError(
            f"mesh {data}x{model}x{space} needs {needed} devices, "
            f"have {len(devices)}"
        )
    grid = np.asarray(devices[:needed]).reshape(data, model, space)
    return Mesh(grid, AXES)


def default_mesh() -> Mesh:
    """All visible devices on the data axis."""
    return make_mesh(data=len(jax.devices()))
