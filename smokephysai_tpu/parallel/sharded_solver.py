"""Fully domain-decomposed Navier-Stokes step: the COMPLETE solver step
(buoyancy -> diffusion -> projection -> advection -> decay,
reference navier_stokes.py:151-173) under `shard_map`, with the simulation
grid row-sharded over the 'space' mesh axis.

Layout. Cell-centred fields (density, p) and v (h rows) shard evenly into
row blocks of hb = h/S. The staggered u field has h+1 rows, which cannot
shard evenly — it is stored in an *overlapped* layout: shard i holds u rows
[i*hb, (i+1)*hb] (hb+1 rows), so consecutive shards duplicate one shared
face row. Every operation computes the duplicated row identically on both
owners (same neighbourhood data via halos), so the copies never diverge —
verified by the exact-equality tests.

Communication per step (all `lax.ppermute` over the ICI ring):
  * 1-row halos for the three diffusion stencils
  * 1-row halo per Jacobi sweep (num_iters exchanges)
  * 1-row p halo for the velocity correction
  * max_disp-row halos + 1-row velocity halos for the three advections

Numerics are exactly the single-device `solver.step` (same quirks, same
tent-shift advection); tests/test_parallel.py checks element-wise equality
on an 8-device mesh.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smokephysai_tpu.physics.state import SimState

Array = jnp.ndarray


# ---------------------------------------------------------------- layout
def to_overlapped(u: Array, num_shards: int) -> Array:
    """(h+1, w) canonical u -> (S*(hb+1), w) overlapped row blocks."""
    h = u.shape[0] - 1
    hb = h // num_shards
    blocks = [u[i * hb : (i + 1) * hb + 1, :] for i in range(num_shards)]
    return jnp.concatenate(blocks, axis=0)


def from_overlapped(u_ov: Array, num_shards: int) -> Array:
    """Inverse of `to_overlapped` (keeps each block's first hb rows, plus
    the final block's last row)."""
    rows = u_ov.shape[0] // num_shards  # hb + 1
    hb = rows - 1
    blocks = u_ov.reshape(num_shards, rows, -1)
    body = blocks[:, :hb, :].reshape(num_shards * hb, -1)
    return jnp.concatenate([body, blocks[-1, hb:, :]], axis=0)


# ------------------------------------------------------------- primitives
def _from_prev(x_rows: Array, axis: str) -> Array:
    """Ship rows one shard down the ring (receiver i gets shard i-1's)."""
    n = lax.axis_size(axis)
    return lax.ppermute(x_rows, axis, [(i, (i + 1) % n) for i in range(n)])


def _from_next(x_rows: Array, axis: str) -> Array:
    n = lax.axis_size(axis)
    return lax.ppermute(x_rows, axis, [(i, (i - 1) % n) for i in range(n)])


def _diffuse_rows(field: Array, top: Array, bottom: Array, coef) -> Array:
    """Replicate-pad (columns) 5-point diffusion given explicit halo rows."""
    rows = jnp.concatenate([top, field, bottom], axis=0)
    padded = jnp.pad(rows, ((0, 0), (1, 1)), mode="edge")
    lap = (
        padded[:-2, 1:-1]
        + padded[2:, 1:-1]
        + padded[1:-1, :-2]
        + padded[1:-1, 2:]
        - 4.0 * field
    )
    return field + coef * lap


def _hat(t: Array) -> Array:
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


# ------------------------------------------------------------- local step
def _local_step(
    u_ov: Array,
    v: Array,
    p: Array,
    density: Array,
    *,
    h: int,
    w: int,
    dt: float,
    viscosity: float,
    num_jacobi_iters: int,
    max_disp: int,
    axis: str,
):
    S = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    hb = h // S
    a = idx * hb  # first global row of this shard's block
    D = max_disp

    # ---- 1. buoyancy (reference quirk: on the w slice of v) -------------
    v = v.at[:, :-1].add(dt * 0.1 * density)

    # ---- 2. diffusion ----------------------------------------------------
    # u (overlapped): global halo rows a-1 and b+1
    top_u = _from_prev(u_ov[hb - 1 : hb, :], axis)  # prev's global b_prev-1
    bot_u = _from_next(u_ov[1:2, :], axis)  # next's global a_next+1
    top_u = jnp.where(idx == 0, u_ov[:1, :], top_u)  # replicate pad
    bot_u = jnp.where(idx == S - 1, u_ov[-1:, :], bot_u)
    u_ov = _diffuse_rows(u_ov, top_u, bot_u, dt * viscosity)

    def diffuse_plain(f, coef):
        top = _from_prev(f[-1:, :], axis)
        bot = _from_next(f[:1, :], axis)
        top = jnp.where(idx == 0, f[:1, :], top)
        bot = jnp.where(idx == S - 1, f[-1:, :], bot)
        return _diffuse_rows(f, top, bot, coef)

    v = diffuse_plain(v, dt * viscosity)
    density = diffuse_plain(density, dt * viscosity * 0.1)

    # ---- 3. pressure projection -----------------------------------------
    # divergence: all rows local thanks to the overlapped u layout
    div = (u_ov[1:, :] - u_ov[:-1, :] + v[:, 1:] - v[:, :-1]) / dt

    # Jacobi sweeps with zero-Dirichlet global boundary (halo per sweep)
    row_ids = lax.broadcasted_iota(jnp.int32, (hb, w), 0)
    col_ids = lax.broadcasted_iota(jnp.int32, (hb, w), 1)
    interior = (
        ((idx > 0) | (row_ids > 0))
        & ((idx < S - 1) | (row_ids < hb - 1))
        & (col_ids > 0)
        & (col_ids < w - 1)
    )

    def sweep(_, pp):
        top = _from_prev(pp[-1:, :], axis)
        bot = _from_next(pp[:1, :], axis)
        top = jnp.where(idx == 0, jnp.zeros_like(top), top)
        bot = jnp.where(idx == S - 1, jnp.zeros_like(bot), bot)
        rows = jnp.concatenate([top, pp, bot], axis=0)
        left = jnp.pad(pp, ((0, 0), (1, 0)))[:, :-1]
        right = jnp.pad(pp, ((0, 0), (0, 1)))[:, 1:]
        val = 0.25 * (rows[:-2, :] + rows[2:, :] + left + right - div)
        return jnp.where(interior, val, 0.0)

    p = lax.fori_loop(0, num_jacobi_iters, sweep, p)

    # velocity correction: u rows need p[global r] - p[global r-1]
    p_prev = _from_prev(p[-1:, :], axis)  # global a-1 (garbage on shard 0)
    p_next = _from_next(p[:1, :], axis)  # global b+1... actually global b? see below
    # p_ext rows cover global a-1 .. a+hb (= b): [p_prev, p, p_next]
    p_ext = jnp.concatenate([p_prev, p, p_next], axis=0)
    du = p_ext[1:, :] - p_ext[:-1, :]  # du[r_loc] = p[a+r_loc] - p[a+r_loc-1]
    u_rows_global = a + lax.broadcasted_iota(jnp.int32, (hb + 1, w), 0)
    u_mask = (u_rows_global >= 1) & (u_rows_global <= h - 1)
    u_ov = u_ov - jnp.where(u_mask, dt * du, 0.0)
    v = v.at[:, 1:-1].add(-dt * (p[:, 1:] - p[:, :-1]))

    # ---- 4. advection (tent shifts, gather-free) -------------------------

    def centered_u_at(u_src: Array, nrows: int, fw: int) -> Array:
        """0.5*(u[r, j] + u[r, j+1]) for j <= uw-2, else 0, over the first
        `nrows` local rows of u_src, on an fw-wide grid."""
        uw = u_src.shape[1]
        ncols = min(fw, uw - 1)
        core = 0.5 * (u_src[:nrows, :ncols] + u_src[:nrows, 1 : ncols + 1])
        return jnp.pad(core, ((0, 0), (0, fw - ncols)))

    def tent_advect(f: Array, f_global_h: int, f_row0: Array, u_c: Array,
                    v_c: Array, fw: int, overlap: int = 0):
        """Advect local block f (rows are global f_row0..f_row0+nf-1 of an
        f_global_h-row field) using cell-centred velocities u_c, v_c at
        those rows. Halo: D rows each side via ppermute. For the overlapped
        u layout (`overlap=1`), neighbours' edge rows duplicate ours, so the
        halo slices skip one row."""
        nf = f.shape[0]
        rows_g = f_row0 + lax.broadcasted_iota(jnp.float32, (nf, fw), 0)
        x_cols = lax.broadcasted_iota(jnp.float32, (1, fw), 1)
        prev_x = jnp.clip(x_cols - dt * u_c, 0, fw - 1)
        prev_y = jnp.clip(rows_g - dt * v_c, 0, f_global_h - 1)

        o = overlap
        halo_top = _from_prev(f[-D - o : nf - o, :], axis)
        halo_bot = _from_next(f[o : D + o, :], axis)
        halo_top = jnp.where(idx == 0, jnp.zeros_like(halo_top), halo_top)
        halo_bot = jnp.where(idx == S - 1, jnp.zeros_like(halo_bot), halo_bot)
        f_ext = jnp.concatenate([halo_top, f, halo_bot], axis=0)
        f_ext = jnp.pad(f_ext, ((0, 0), (D, D)))

        out = jnp.zeros_like(f)
        for di in range(-D, D + 1):
            wy = _hat(prev_y - (rows_g + di))
            for dj in range(-D, D + 1):
                wx = _hat(prev_x - (x_cols + dj))  # broadcasts over rows
                shifted = lax.dynamic_slice(
                    f_ext, (D + di, D + dj), (nf, fw)
                )
                out = out + wy * wx * shifted
        edge_zero = (prev_x < fw - 1) & (prev_y < f_global_h - 1)
        return jnp.where(edge_zero, out, 0.0)

    # v halo for centred v: next shard's first TWO rows (the r+1 tap can
    # reach one row past the u block's duplicated last row)
    v_next01 = _from_next(v[:2, :], axis)
    v_ext = jnp.concatenate([v, v_next01], axis=0)  # rows global a..b+1

    def centered_v_at(nrows: int, fw: int) -> Array:
        """0.5*(v[global r] + v[global r+1]) masked to 0 for r >= h-1, for
        local rows a..a+nrows-1."""
        vc = 0.5 * (v_ext[:nrows, :fw] + v_ext[1 : 1 + nrows, :fw])
        rows_g = a + lax.broadcasted_iota(jnp.int32, (nrows, fw), 0)
        return jnp.where(rows_g >= h - 1, 0.0, vc)

    # --- advect u (overlapped block: hb+1 rows, global rows a..b of h+1) --
    u_c_for_u = centered_u_at(u_ov, hb + 1, w)
    v_c_for_u = centered_v_at(hb + 1, w)
    u_new = tent_advect(
        u_ov, h + 1, jnp.float32(a), u_c_for_u, v_c_for_u, w, overlap=1
    )

    # --- advect v with the UPDATED u (reference sequential quirk) --------
    u_c_for_v = centered_u_at(u_new, hb, w + 1)
    v_c_for_v = centered_v_at(hb, w + 1)
    v_new = tent_advect(v, h, jnp.float32(a), u_c_for_v, v_c_for_v, w + 1)

    # --- advect density with updated u and v ------------------------------
    # rebuild the centred-v helper from the UPDATED v
    v_new_next0 = _from_next(v_new[:1, :], axis)
    v_new_ext = jnp.concatenate([v_new, v_new_next0], axis=0)
    vc_d = 0.5 * (v_new_ext[:hb, :w] + v_new_ext[1 : hb + 1, :w])
    rows_g_d = a + lax.broadcasted_iota(jnp.int32, (hb, w), 0)
    vc_d = jnp.where(rows_g_d >= h - 1, 0.0, vc_d)
    uc_d = centered_u_at(u_new, hb, w)
    density_new = tent_advect(
        density, h, jnp.float32(a), uc_d, vc_d, w
    )

    # ---- 5. decay ---------------------------------------------------------
    return u_new, v_new, p, density_new * 0.995


# --------------------------------------------------------------- wrapper
def sharded_step(
    state: SimState,
    mesh: Mesh,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    max_disp: int = 2,
    axis_name: str = "space",
) -> SimState:
    """One full solver step with the grid row-sharded over `axis_name`.
    Drop-in equal to `physics.solver.step` (without vorticity/pallas
    options). h must divide by the axis size."""
    S = mesh.shape[axis_name]
    h, w = state.density.shape

    u_ov = to_overlapped(state.u, S)
    fn = shard_map(
        functools.partial(
            _local_step,
            h=h,
            w=w,
            dt=dt,
            viscosity=viscosity,
            num_jacobi_iters=num_jacobi_iters,
            max_disp=max_disp,
            axis=axis_name,
        ),
        mesh=mesh,
        in_specs=(
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
        ),
        out_specs=(
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
            P(axis_name, None),
        ),
        check_vma=False,
    )
    u_ov, v, p, density = fn(u_ov, state.v, state.p, state.density)
    return SimState(
        u=from_overlapped(u_ov, S), v=v, p=p, density=density
    )


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "num_steps", "num_jacobi_iters", "max_disp",
                     "axis_name"),
)
def sharded_multi_step(
    state: SimState,
    mesh: Mesh,
    num_steps: int,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    max_disp: int = 2,
    axis_name: str = "space",
) -> Tuple[SimState, Array]:
    """Jitted scan over `num_steps` domain-decomposed steps; returns the
    final state and the row-sharded density trajectory [T, H, W]."""

    def body(s, _):
        s = sharded_step(
            s, mesh, dt=dt, viscosity=viscosity,
            num_jacobi_iters=num_jacobi_iters, max_disp=max_disp,
            axis_name=axis_name,
        )
        return s, s.density

    return lax.scan(body, state, None, length=num_steps)
