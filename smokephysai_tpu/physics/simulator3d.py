"""Fused 3D episode generation for the 128^3 volumetric config
(BASELINE.json configs[3]; no reference analog — the reference is 2D).

Mirrors `simulator.simulate_episode`: sources -> scan(step3d) -> chaos
label, one jitted program per episode batch. Chaos features reuse the
generalised 2D definitions (chaos.py handles volumes: 3D box counting,
volume entropy, volumetric Lyapunov window)."""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

from . import chaos as chaos_mod
from . import solver3d

Array = jnp.ndarray


@functools.partial(
    jax.jit,
    static_argnames=(
        "grid_size", "num_steps", "num_cg_iters", "max_sources",
        "pressure_solver",
    ),
)
def simulate_episode3d(
    source_xyz: Array,
    source_intensity: Array,
    source_active: Array,
    grid_size: Tuple[int, int, int] = (64, 64, 64),
    num_steps: int = 20,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_cg_iters: int = 30,
    max_sources: int = 3,
    pressure_solver: str = "cg",
) -> Tuple[Array, Array]:
    """One fused 3D episode. source_xyz: [max_sources, 3] (x, y, z).
    Returns (sequence [T, D, H, W], chaos_label [3])."""
    state = solver3d.init_state3d(grid_size)
    density = state.density
    for i in range(max_sources):
        blob = solver3d.add_smoke_source3d(
            jnp.zeros_like(density),
            source_xyz[i, 0],
            source_xyz[i, 1],
            source_xyz[i, 2],
            radius=8.0,
            intensity=source_intensity[i],
        )
        density = density + source_active[i] * blob
    state = state.replace(density=density)

    def body(s, _):
        s = solver3d.step3d(
            s, dt=dt, viscosity=viscosity, num_cg_iters=num_cg_iters,
            pressure_solver=pressure_solver,
        )
        return s, s.density

    _, sequence = lax.scan(body, state, None, length=num_steps)
    label = chaos_mod.chaos_features_from_sequence(sequence)
    return sequence, label
