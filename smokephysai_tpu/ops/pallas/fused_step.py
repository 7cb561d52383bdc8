"""Fused whole-step (and whole-episode) solver kernels.

The XLA `solver.step` pipeline is ~10 separate fusions per step — buoyancy,
3x diffusion, divergence, the Jacobi loop, the velocity correction, and 3x
advection — each round-tripping every field through HBM. These kernels keep
the entire `SimState` (u, v, p, density) resident in VMEM:

* `fused_step_pallas`       — ONE kernel per solver step: one HBM read and
                              one write of the four fields total.
* `fused_multi_step_pallas` — the whole `num_steps` time loop inside one
                              kernel: the fields never leave VMEM between
                              steps; only the density trajectory streams out.

Numerics are element-for-element the same pipeline as `solver.step`
(reference navier_stokes.py:151-173 order, incl. the buoyancy-on-`v[:, :-1]`
quirk, warm-started zero-boundary Jacobi, sequential u-then-v advection and
the tent-shift gather-free bilinear with exact-edge zeroing) — verified
against the XLA path in tests/test_pallas.py.

The vorticity-confinement branch and the general gather advection path
(max_disp=0) are NOT fused; callers fall back to the per-op kernels there.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import use_interpret

Array = jnp.ndarray

# Whole state + temps resident in VMEM. v5e has 128 MiB of VMEM per core;
# the default 16 MiB scoped-vmem compiler limit is raised per-kernel via
# CompilerParams(vmem_limit_bytes=_VMEM_LIMIT). Budgeting: one solver step
# holds ~24 live (h, w) f32 planes at its advection peak (state in+out,
# padded fields, tent-weight planes, Mosaic spill margin — measured 19.8 MiB
# at 256^2 with a 20-frame trajectory).
_VMEM_LIMIT = 100 * 1024 * 1024
VMEM_BUDGET_BYTES = 96 * 1024 * 1024
_STEP_PLANES = 24


def _zeros_pad(f: Array, top: int, bottom: int, left: int, right: int) -> Array:
    """jnp.pad(..., constant 0) via concatenate (Mosaic-friendly)."""
    h, w = f.shape
    cols = []
    if top:
        cols.append(jnp.zeros((top, w), f.dtype))
    cols.append(f)
    if bottom:
        cols.append(jnp.zeros((bottom, w), f.dtype))
    f = jnp.concatenate(cols, axis=0) if len(cols) > 1 else f
    h = f.shape[0]
    rows = []
    if left:
        rows.append(jnp.zeros((h, left), f.dtype))
    rows.append(f)
    if right:
        rows.append(jnp.zeros((h, right), f.dtype))
    return jnp.concatenate(rows, axis=1) if len(rows) > 1 else f


def _diffuse_val(f: Array, coef: Array) -> Array:
    """solver.diffuse on a VMEM-resident value (replicate-pad Laplacian)."""
    up = jnp.concatenate([f[:1, :], f[:-1, :]], axis=0)
    down = jnp.concatenate([f[1:, :], f[-1:, :]], axis=0)
    left = jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
    right = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    return f + coef * (up + down + left + right - 4.0 * f)


def _jacobi_val(p: Array, div: Array, num_iters: int) -> Array:
    """solver.jacobi_pressure on VMEM-resident values (zero-Dirichlet
    re-imposed each sweep, warm start from the incoming p)."""
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

    return lax.fori_loop(0, num_iters, sweep, p)


def _advect_val(field: Array, u: Array, v: Array, dt: Array, D: int) -> Array:
    """solver.advect (tent-shift path) on VMEM-resident values: static
    2-tap velocity centring + (2D+1)^2 shift+FMA tent decomposition +
    exact-edge zeroing (solver.py:141-208)."""
    h, w = field.shape
    # Mosaic only supports integer iota; cast to the field dtype after
    y_c = lax.broadcasted_iota(jnp.int32, (h, w), 0).astype(field.dtype)
    x_c = lax.broadcasted_iota(jnp.int32, (h, w), 1).astype(field.dtype)

    uw = u.shape[1]
    ncols = min(w, uw - 1)
    u_core = 0.5 * (u[:h, :ncols] + u[:h, 1 : ncols + 1])
    u_i = _zeros_pad(u_core, 0, 0, 0, w - ncols)

    vh = v.shape[0]
    nrows = min(h, vh - 1)
    v_core = 0.5 * (v[:nrows, :w] + v[1 : nrows + 1, :w])
    v_i = _zeros_pad(v_core, 0, h - nrows, 0, 0)

    prev_x = jnp.clip(x_c - dt * u_i, 0, w - 1)
    prev_y = jnp.clip(y_c - dt * v_i, 0, h - 1)

    # Shift taps are zero-filled concatenates of the UNPADDED field: keeping
    # every buffer at the field's own (lane-aligned) shape is what keeps
    # Mosaic from spilling — a (h+2D, w+2D) padded copy forces a misaligned
    # 384-lane layout at 256^2 that slows the whole kernel ~10x.
    def tap(di: int, dj: int) -> Array:
        f = field
        if di > 0:
            f = jnp.concatenate(
                [f[di:, :], jnp.zeros((di, w), f.dtype)], axis=0
            )
        elif di < 0:
            f = jnp.concatenate(
                [jnp.zeros((-di, w), f.dtype), f[:di, :]], axis=0
            )
        if dj > 0:
            f = jnp.concatenate(
                [f[:, dj:], jnp.zeros((h, dj), f.dtype)], axis=1
            )
        elif dj < 0:
            f = jnp.concatenate(
                [jnp.zeros((h, -dj), f.dtype), f[:, :dj]], axis=1
            )
        return f

    out = jnp.zeros_like(field)
    for di in range(-D, D + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(prev_y - (y_c + di)))
        for dj in range(-D, D + 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(prev_x - (x_c + dj)))
            out = out + wy * wx * tap(di, dj)

    edge_zero = (prev_x < w - 1) & (prev_y < h - 1)
    return jnp.where(edge_zero, out, 0.0)


def _step_vals(
    u: Array, v: Array, p: Array, d: Array,
    dt: Array, viscosity: Array,
    num_jacobi_iters: int, max_disp: int,
) -> Tuple[Array, Array, Array, Array]:
    """One full solver step on VMEM-resident values — the exact
    solver.step pipeline (navier_stokes.py:151-173 order)."""
    # 1. buoyancy on v[:, :-1] (reference quirk)
    v = jnp.concatenate([v[:, :-1] + dt * 0.1 * d, v[:, -1:]], axis=1)

    # 2. diffusion
    u = _diffuse_val(u, dt * viscosity)
    v = _diffuse_val(v, dt * viscosity)
    d = _diffuse_val(d, dt * viscosity * 0.1)

    # 3. pressure projection (warm-started Jacobi + interior correction)
    div = (u[1:, :] - u[:-1, :] + v[:, 1:] - v[:, :-1]) / dt
    p = _jacobi_val(p, div, num_jacobi_iters)
    u = jnp.concatenate(
        [u[:1, :], u[1:-1, :] - dt * (p[1:, :] - p[:-1, :]), u[-1:, :]], axis=0
    )
    v = jnp.concatenate(
        [v[:, :1], v[:, 1:-1] - dt * (p[:, 1:] - p[:, :-1]), v[:, -1:]], axis=1
    )

    # 4. sequential advection (v sees updated u; density sees both)
    u_new = _advect_val(u, u, v, dt, max_disp)
    v_new = _advect_val(v, u_new, v, dt, max_disp)
    d_new = _advect_val(d, u_new, v_new, dt, max_disp)

    # 5. density decay
    return u_new, v_new, p, d_new * 0.995


def _fused_step_kernel(
    scal_ref, u_ref, v_ref, p_ref, d_ref,
    u_out, v_out, p_out, d_out,
    *, num_jacobi_iters: int, max_disp: int,
):
    dt, viscosity = scal_ref[0, 0], scal_ref[0, 1]
    u, v, p, d = _step_vals(
        u_ref[:], v_ref[:], p_ref[:], d_ref[:],
        dt, viscosity, num_jacobi_iters, max_disp,
    )
    u_out[:] = u
    v_out[:] = v
    p_out[:] = p
    d_out[:] = d


def _fused_multi_step_kernel(
    scal_ref, u_ref, v_ref, p_ref, d_ref,
    u_out, v_out, p_out, d_out, traj_ref,
    *, num_steps: int, num_jacobi_iters: int, max_disp: int,
):
    dt, viscosity = scal_ref[0, 0], scal_ref[0, 1]

    def body(t, carry):
        u, v, p, d = _step_vals(
            *carry, dt, viscosity, num_jacobi_iters, max_disp
        )
        traj_ref[t] = d
        return (u, v, p, d)

    u, v, p, d = lax.fori_loop(
        0, num_steps, body, (u_ref[:], v_ref[:], p_ref[:], d_ref[:])
    )
    u_out[:] = u
    v_out[:] = v
    p_out[:] = p
    d_out[:] = d


def fits_fused_step(grid_size: Tuple[int, int], traj_steps: int = 0) -> bool:
    """VMEM feasibility gate for the fused kernels."""
    h, w = grid_size
    plane = h * w * 4
    return (_STEP_PLANES + traj_steps) * plane <= VMEM_BUDGET_BYTES


@functools.partial(
    jax.jit, static_argnames=("num_jacobi_iters", "max_disp")
)
def fused_step_pallas(
    u: Array, v: Array, p: Array, density: Array,
    dt, viscosity,
    num_jacobi_iters: int = 20, max_disp: int = 1,
) -> Tuple[Array, Array, Array, Array]:
    """One whole solver step in a single VMEM-resident kernel.

    `max_disp=1` is bit-identical to the XLA max_disp=2 default whenever the
    backtrace displacement is under 1 cell (taps beyond the nearest ring get
    an exactly-zero tent weight; measured sims peak ~6e-4 cells/step) and
    keeps the tap count at 9 instead of 25."""
    scal = jnp.stack(
        [jnp.asarray(dt, jnp.float32), jnp.asarray(viscosity, jnp.float32)]
    ).reshape(1, 2)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(
            _fused_step_kernel,
            num_jacobi_iters=num_jacobi_iters, max_disp=max_disp,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(density.shape, density.dtype),
        ],
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            vmem, vmem, vmem, vmem,
        ],
        out_specs=[vmem, vmem, vmem, vmem],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=use_interpret(),
    )(scal, u, v, p, density)


@functools.partial(
    jax.jit, static_argnames=("num_steps", "num_jacobi_iters", "max_disp")
)
def fused_multi_step_pallas(
    u: Array, v: Array, p: Array, density: Array,
    num_steps: int,
    dt=0.01, viscosity=0.001,
    num_jacobi_iters: int = 20, max_disp: int = 1,
) -> Tuple[Tuple[Array, Array, Array, Array], Array]:
    """The whole `num_steps` time loop in ONE kernel. Returns the final
    (u, v, p, density) and the density trajectory [T, H, W]."""
    scal = jnp.stack(
        [jnp.asarray(dt, jnp.float32), jnp.asarray(viscosity, jnp.float32)]
    ).reshape(1, 2)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _fused_multi_step_kernel,
            num_steps=num_steps,
            num_jacobi_iters=num_jacobi_iters, max_disp=max_disp,
        ),
        out_shape=[
            jax.ShapeDtypeStruct(u.shape, u.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
            jax.ShapeDtypeStruct(p.shape, p.dtype),
            jax.ShapeDtypeStruct(density.shape, density.dtype),
            jax.ShapeDtypeStruct((num_steps, *density.shape), density.dtype),
        ],
        in_specs=[
            pl.BlockSpec((1, 2), memory_space=pltpu.SMEM),
            vmem, vmem, vmem, vmem,
        ],
        out_specs=[vmem, vmem, vmem, vmem, vmem],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=use_interpret(),
    )(scal, u, v, p, density)
    return tuple(outs[:4]), outs[4]
