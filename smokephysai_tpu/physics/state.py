"""Pure-pytree simulation state.

The reference keeps mutable fields on an nn.Module
(reference: src/physics/navier_stokes.py:27-35). TPU-native design is a
frozen pytree that flows through jitted pure functions and `lax.scan`.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SimState:
    """MAC-ish staggered-grid state.

    Shapes (reference: src/physics/navier_stokes.py:27-32):
      u:       (h + 1, w)   vertical-face-staggered x-velocity
      v:       (h, w + 1)   horizontal-face-staggered y-velocity
      p:       (h, w)       pressure (persists across steps: the Jacobi
                            solve warm-starts from the previous projection)
      density: (h, w)       smoke density
    """

    u: jnp.ndarray
    v: jnp.ndarray
    p: jnp.ndarray
    density: jnp.ndarray

    @property
    def grid_size(self) -> tuple[int, int]:
        return self.density.shape[-2], self.density.shape[-1]
