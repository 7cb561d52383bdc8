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


def _jacobi_tiled_kernel(
    p_hbm, div_hbm, out_ref, p_s, d_s, sems,
    *, num_iters: int, stripe: int, h: int, w: int,
):
    """One row-stripe of the overlapping-halo tiled Jacobi.

    A Jacobi sweep propagates information one row per iteration, so a
    stripe extended by `num_iters` halo rows on each side computes its
    interior `stripe` rows EXACTLY as the global sweep would — no
    inter-tile communication, bit-identical numerics. The caller pads
    p/div by `num_iters` zero rows top+bottom; stripe i DMAs padded rows
    [i*stripe, i*stripe + stripe + 2*num_iters) from HBM, sweeps in VMEM,
    and writes back its interior rows only. Redundant compute is
    2*num_iters/stripe (~16% at stripe=256, 20 iters) vs a ~20x cut in
    HBM traffic against the per-sweep XLA loop.
    """
    i = pl.program_id(0)
    K = num_iters
    rows = stripe + 2 * K
    start = i * stripe

    cp_p = pltpu.make_async_copy(
        p_hbm.at[pl.ds(start, rows), :], p_s, sems.at[0]
    )
    cp_d = pltpu.make_async_copy(
        div_hbm.at[pl.ds(start, rows), :], d_s, sems.at[1]
    )
    cp_p.start()
    cp_d.start()
    cp_p.wait()
    cp_d.wait()

    # global-coordinate interior mask: padded row r is global row
    # (i*stripe - K) + r; zero-Dirichlet outside [1, h-2] x [1, w-2]
    local_row = lax.broadcasted_iota(jnp.int32, (rows, w), 0)
    col = lax.broadcasted_iota(jnp.int32, (rows, w), 1)
    grow = local_row + start - K
    interior = (grow > 0) & (grow < h - 1) & (col > 0) & (col < w - 1)

    div = d_s[:]

    def sweep(_, p):
        zero_row = jnp.zeros((1, w), p.dtype)
        up = jnp.concatenate([zero_row, p[:-1, :]], axis=0)
        down = jnp.concatenate([p[1:, :], zero_row], axis=0)
        zero_col = jnp.zeros((rows, 1), p.dtype)
        left = jnp.concatenate([zero_col, p[:, :-1]], axis=1)
        right = jnp.concatenate([p[:, 1:], zero_col], axis=1)
        interior_val = 0.25 * (up + down + left + right - div)
        return jnp.where(interior, interior_val, 0.0)

    out_ref[:] = lax.fori_loop(0, num_iters, sweep, p_s[:])[K : K + stripe, :]


def _pick_stripe(h: int, num_iters: int, w: int, itemsize: int) -> int:
    """Largest power-of-two stripe height dividing h whose two
    (stripe + 2*num_iters, w) scratch buffers + output block fit."""
    s = 512
    while s >= 64:
        if h % s == 0:
            need = (2 * (s + 2 * num_iters) + s) * w * itemsize
            if need <= VMEM_BUDGET_BYTES:
                return s
        s //= 2
    return 0


@functools.partial(jax.jit, static_argnames=("num_iters",))
def jacobi_pressure_pallas(p: Array, div: Array, num_iters: int = 20) -> Array:
    """Drop-in for solver.jacobi_pressure. Whole grid in VMEM when it fits;
    row-striped overlapping-halo tiles beyond that (1024^2+); XLA fallback
    only for grids the tiler can't split (h not divisible by a stripe)."""
    h, w = p.shape
    if 3 * h * w * p.dtype.itemsize <= VMEM_BUDGET_BYTES:
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

    stripe = _pick_stripe(h, num_iters, w, p.dtype.itemsize)
    if not stripe:
        from smokephysai_tpu.physics.solver import jacobi_pressure

        return jacobi_pressure(p, div, num_iters)

    K = num_iters
    zpad = jnp.zeros((K, w), p.dtype)
    p_pad = jnp.concatenate([zpad, p, zpad], axis=0)
    div_pad = jnp.concatenate([zpad, div, zpad], axis=0)
    return pl.pallas_call(
        functools.partial(
            _jacobi_tiled_kernel,
            num_iters=num_iters, stripe=stripe, h=h, w=w,
        ),
        grid=(h // stripe,),
        out_shape=jax.ShapeDtypeStruct((h, w), p.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (stripe, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((stripe + 2 * K, w), p.dtype),
            pltpu.VMEM((stripe + 2 * K, w), p.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=use_interpret(),
    )(p_pad, div_pad)
