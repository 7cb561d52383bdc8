"""Row-block domain decomposition for the grid solver: halo exchange via
`shard_map` + `lax.ppermute` over the 'space' mesh axis.

This is the TPU-native equivalent of a NCCL halo pipeline (SURVEY.md §2.6
'spatial domain decomposition'): each device owns a contiguous block of grid
rows; stencil ops exchange single-row halos with ring neighbours over ICI.
Used for the hot pressure-projection loop (20 Jacobi sweeps,
reference navier_stokes.py:139-145) and the diffusion stencil
(navier_stokes.py:50-72) on grids too large for one core (BASELINE.json
512^2 / 1024^2 configs).

Numerics are identical to the single-device path — verified in
tests/test_parallel.py on an 8-device CPU mesh.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

Array = jnp.ndarray


def halo_exchange_rows(
    x: Array, axis_name: str = "space", edge: str = "replicate"
) -> Tuple[Array, Array]:
    """Return (row_above, row_below) for a row-block shard: the last row of
    the previous shard and the first row of the next shard, exchanged over
    the ICI ring. Grid-edge shards fall back to `edge` handling:
    'replicate' (replicate-pad, diffusion) or 'zero' (Dirichlet, Jacobi).
    """
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)

    # ship our first row up (to i-1) and our last row down (to i+1)
    up = [(i, (i - 1) % n) for i in range(n)]
    down = [(i, (i + 1) % n) for i in range(n)]
    from_below = lax.ppermute(x[:1, :], axis_name, up)  # next shard's first row
    from_above = lax.ppermute(x[-1:, :], axis_name, down)  # prev shard's last row

    if edge == "replicate":
        top = jnp.where(idx == 0, x[:1, :], from_above)
        bottom = jnp.where(idx == n - 1, x[-1:, :], from_below)
    elif edge == "zero":
        top = jnp.where(idx == 0, jnp.zeros_like(x[:1, :]), from_above)
        bottom = jnp.where(idx == n - 1, jnp.zeros_like(x[:1, :]), from_below)
    else:
        raise ValueError(edge)
    return top, bottom


def _local_diffuse(field: Array, dt: float, viscosity: float, axis_name: str) -> Array:
    """Per-shard diffusion step with halo rows; columns replicate-pad
    locally (matches solver.diffuse semantics exactly)."""
    top, bottom = halo_exchange_rows(field, axis_name, edge="replicate")
    rows = jnp.concatenate([top, field, bottom], axis=0)  # [h_loc+2, w]
    padded = jnp.pad(rows, ((0, 0), (1, 1)), mode="edge")
    laplacian = (
        padded[:-2, 1:-1]
        + padded[2:, 1:-1]
        + padded[1:-1, :-2]
        + padded[1:-1, 2:]
        - 4.0 * field
    )
    return field + dt * viscosity * laplacian


def _local_jacobi(
    p: Array, div: Array, num_iters: int, axis_name: str
) -> Array:
    """Per-shard Jacobi sweeps with a halo exchange between sweeps.
    Reproduces the zero-Dirichlet re-imposition of the reference
    (navier_stokes.py:139-145): global boundary rows/cols forced to zero
    every sweep."""
    idx = lax.axis_index(axis_name)
    n = lax.axis_size(axis_name)
    h_loc, w = p.shape
    row_ids = lax.broadcasted_iota(jnp.int32, (h_loc, w), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (h_loc, w), 1)
    is_interior = (
        ((idx > 0) | (row_ids > 0))
        & ((idx < n - 1) | (row_ids < h_loc - 1))
        & (col_ids > 0)
        & (col_ids < w - 1)
    )

    def sweep(_, p):
        top, bottom = halo_exchange_rows(p, axis_name, edge="zero")
        rows = jnp.concatenate([top, p, bottom], axis=0)  # [h_loc+2, w]
        up = rows[:-2, :]
        down = rows[2:, :]
        left = jnp.pad(p, ((0, 0), (1, 0)))[:, :-1]
        right = jnp.pad(p, ((0, 0), (0, 1)))[:, 1:]
        interior = 0.25 * (up + down + left + right - div)
        return jnp.where(is_interior, interior, 0.0)

    return lax.fori_loop(0, num_iters, sweep, p)


def sharded_diffuse(
    field: Array, dt: float, viscosity: float, mesh: Mesh, axis_name: str = "space"
) -> Array:
    """Row-sharded diffusion over `mesh` (drop-in for solver.diffuse on
    cell-centred fields)."""
    fn = shard_map(
        functools.partial(
            _local_diffuse, dt=dt, viscosity=viscosity, axis_name=axis_name
        ),
        mesh=mesh,
        in_specs=P(axis_name, None),
        out_specs=P(axis_name, None),
    )
    return fn(field)


def sharded_jacobi(
    p: Array, div: Array, num_iters: int, mesh: Mesh, axis_name: str = "space"
) -> Array:
    """Row-sharded Jacobi pressure solve (drop-in for
    solver.jacobi_pressure). The entire `num_iters`-sweep loop runs inside
    one shard_map region, so the only inter-device traffic is the 1-row
    ppermute per sweep."""
    fn = shard_map(
        functools.partial(_local_jacobi, num_iters=num_iters, axis_name=axis_name),
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None)),
        out_specs=P(axis_name, None),
    )
    return fn(p, div)
