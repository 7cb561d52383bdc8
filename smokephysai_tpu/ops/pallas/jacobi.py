"""Fused Jacobi pressure-projection kernel.

The reference's inner hot loop is 20 Jacobi sweeps over the pressure grid
(reference navier_stokes.py:139-145; SURVEY.md §3.4). Under XLA each sweep
is a separate fusion whose result round-trips through HBM — 2 reads + 1
write of the full grid per sweep. This kernel keeps p and div resident in
VMEM for all sweeps: one HBM read of {p, div} and one write of p total,
a ~20x cut in HBM traffic for the projection stage.

Numerics match `solver.jacobi_pressure` exactly (same zero-Dirichlet
re-imposition each sweep); verified in tests/test_pallas.py and usable as a
drop-in via `pressure_projection(..., jacobi_fn=jacobi_pressure_pallas)`.

Falls back to the XLA path when the grid would not fit in VMEM.
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

# p, div and one temp resident in VMEM; stay under ~12MB of the ~16MB/core
VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _jacobi_kernel(p_ref, div_ref, out_ref, *, num_iters: int):
    div = div_ref[:]
    h, w = div.shape
    row = lax.broadcasted_iota(jnp.int32, (h, w), 0)
    col = lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (row > 0) & (row < h - 1) & (col > 0) & (col < w - 1)

    def sweep(_, p):
        zero_row = jnp.zeros((1, w), p.dtype)
        up = jnp.concatenate([zero_row, p[:-1, :]], axis=0)
        down = jnp.concatenate([p[1:, :], zero_row], axis=0)
        zero_col = jnp.zeros((h, 1), p.dtype)
        left = jnp.concatenate([zero_col, p[:, :-1]], axis=1)
        right = jnp.concatenate([p[:, 1:], zero_col], axis=1)
        interior_val = 0.25 * (up + down + left + right - div)
        return jnp.where(interior, interior_val, 0.0)

    out_ref[:] = lax.fori_loop(0, num_iters, sweep, p_ref[:])


@functools.partial(jax.jit, static_argnames=("num_iters",))
def jacobi_pressure_pallas(p: Array, div: Array, num_iters: int = 20) -> Array:
    """Drop-in for solver.jacobi_pressure. Whole grid in VMEM; XLA fallback
    for grids beyond the VMEM budget (1024^2+ uses the sharded/halo path,
    parallel/halo.py)."""
    h, w = p.shape
    if 3 * h * w * p.dtype.itemsize > VMEM_BUDGET_BYTES:
        from smokephysai_tpu.physics.solver import jacobi_pressure

        return jacobi_pressure(p, div, num_iters)

    return pl.pallas_call(
        functools.partial(_jacobi_kernel, num_iters=num_iters),
        out_shape=jax.ShapeDtypeStruct(p.shape, p.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(p, div)
