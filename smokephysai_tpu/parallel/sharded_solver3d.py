"""Fully domain-decomposed 3D solver step: the COMPLETE `step3d` pipeline
(buoyancy -> diffusion -> CG projection -> advection -> restagger -> decay,
physics/solver3d.py) under `shard_map`, with the volume slab-sharded along
the z axis over the 'space' mesh axis — the multi-chip path for the 128^3
config (BASELINE.json configs[3]; SURVEY.md §2.6 spatial-decomposition row).
The reference has no analog (its navier_stokes.py is single-device 2D).

Layout. Cell-centred fields (p, density) and the in-plane-staggered u
(d,h,w+1) / v (d,h+1,w) shard evenly into z slabs of db = d/S planes. The
z-staggered w field has d+1 planes, which cannot shard evenly — it is
stored *overlapped*: shard i holds w planes [i*db, (i+1)*db] (db+1 planes),
so consecutive shards duplicate one shared face plane, computed identically
by both owners (same neighbourhood data via halos) — the same scheme the 2D
`sharded_solver` uses for its u field.

Communication per step (all `lax.ppermute` over the ICI ring + `lax.psum`
for the CG dots):
  * 1-plane halos for the four diffusion stencils
  * per CG iteration: 1-plane halo for the matvec + 2 scalar psums
  * 1-plane p halo for the w-face velocity correction
  * max_disp-plane halos for the four tent advections
  * 1-plane halo for the w restagger

Numerics match the single-device `solver3d.step3d` exactly up to the CG dot
products' reduction order (per-shard partial sums + psum vs one flat sum —
a ~1-ULP f32 difference per dot); tests/test_parallel.py checks tight
element-wise agreement on an 8-device mesh.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

from smokephysai_tpu.physics.solver3d import SimState3D

Array = jnp.ndarray


# ---------------------------------------------------------------- layout
def to_overlapped3d(w: Array, num_shards: int) -> Array:
    """(d+1, h, w) canonical z-face field -> (S*(db+1), h, w) overlapped
    z slabs (consecutive slabs duplicate one shared plane)."""
    d = w.shape[0] - 1
    db = d // num_shards
    blocks = [w[i * db : (i + 1) * db + 1] for i in range(num_shards)]
    return jnp.concatenate(blocks, axis=0)


def from_overlapped3d(w_ov: Array, num_shards: int) -> Array:
    """Inverse of `to_overlapped3d` (keeps each slab's first db planes,
    plus the final slab's last plane)."""
    planes = w_ov.shape[0] // num_shards  # db + 1
    db = planes - 1
    blocks = w_ov.reshape(num_shards, planes, *w_ov.shape[1:])
    body = blocks[:, :db].reshape(num_shards * db, *w_ov.shape[1:])
    return jnp.concatenate([body, blocks[-1, db:]], axis=0)


# ------------------------------------------------------------- primitives
def _from_prev(x: Array, axis: str) -> Array:
    """Ship planes one shard down the ring (receiver i gets shard i-1's)."""
    n = lax.axis_size(axis)
    return lax.ppermute(x, axis, [(i, (i + 1) % n) for i in range(n)])


def _from_next(x: Array, axis: str) -> Array:
    n = lax.axis_size(axis)
    return lax.ppermute(x, axis, [(i, (i - 1) % n) for i in range(n)])


def _diffuse_planes(field: Array, top: Array, bottom: Array, coef) -> Array:
    """Replicate-padded (in-plane) 7-point diffusion given explicit z-halo
    planes (solver3d.diffuse3d restricted to a slab)."""
    vol = jnp.concatenate([top, field, bottom], axis=0)
    pad = jnp.pad(vol, ((0, 0), (1, 1), (1, 1)), mode="edge")
    lap = (
        pad[:-2, 1:-1, 1:-1]
        + pad[2:, 1:-1, 1:-1]
        + pad[1:-1, :-2, 1:-1]
        + pad[1:-1, 2:, 1:-1]
        + pad[1:-1, 1:-1, :-2]
        + pad[1:-1, 1:-1, 2:]
        - 6.0 * field
    )
    return field + coef * lap


def _hat(t: Array) -> Array:
    return jnp.maximum(0.0, 1.0 - jnp.abs(t))


# ------------------------------------------------------------- local step
def _local_step3d(
    u: Array,
    v: Array,
    w_ov: Array,
    p: Array,
    density: Array,
    *,
    d: int,
    h: int,
    w: int,
    dt: float,
    viscosity: float,
    buoyancy: float,
    num_cg_iters: int,
    max_disp: int,
    axis: str,
):
    S = lax.axis_size(axis)
    idx = lax.axis_index(axis)
    db = d // S
    a = idx * db  # first global z plane of this shard's slab
    D = max_disp

    def halo_prev(f: Array, n: int) -> Array:
        """Last n planes of the previous shard; zeros on the first shard."""
        hp = _from_prev(f[f.shape[0] - n :], axis)
        return jnp.where(idx == 0, jnp.zeros_like(hp), hp)

    def halo_next(f: Array, n: int) -> Array:
        hn = _from_next(f[:n], axis)
        return jnp.where(idx == S - 1, jnp.zeros_like(hn), hn)

    # ---- 1. buoyancy on vertical faces (step3d: w[:-1] += dt*b*density) --
    # the duplicated last plane (global a+db) uses the NEXT shard's first
    # density plane; the global top face d gets no update
    dens_next0 = _from_next(density[:1], axis)
    w_body = w_ov[:-1] + dt * buoyancy * density
    last_add = jnp.where(
        idx == S - 1, jnp.zeros_like(dens_next0), dt * buoyancy * dens_next0
    )
    w_ov = jnp.concatenate([w_body, w_ov[-1:] + last_add], axis=0)

    # ---- 2. diffusion ----------------------------------------------------
    def diffuse_even(f: Array, coef) -> Array:
        top = _from_prev(f[-1:], axis)
        bot = _from_next(f[:1], axis)
        top = jnp.where(idx == 0, f[:1], top)  # replicate pad at boundary
        bot = jnp.where(idx == S - 1, f[-1:], bot)
        return _diffuse_planes(f, top, bot, coef)

    u = diffuse_even(u, dt * viscosity)
    v = diffuse_even(v, dt * viscosity)
    density = diffuse_even(density, dt * viscosity * 0.1)
    # w (overlapped): global halo planes a-1 and b+1 skip the duplicates
    top_w = _from_prev(w_ov[db - 1 : db], axis)
    bot_w = _from_next(w_ov[1:2], axis)
    top_w = jnp.where(idx == 0, w_ov[:1], top_w)
    bot_w = jnp.where(idx == S - 1, w_ov[-1:], bot_w)
    w_ov = _diffuse_planes(w_ov, top_w, bot_w, dt * viscosity)

    # ---- 3. CG pressure projection ---------------------------------------
    # divergence: all planes local thanks to the overlapped w layout
    div = (
        u[:, :, 1:] - u[:, :, :-1]
        + v[:, 1:, :] - v[:, :-1, :]
        + w_ov[1:] - w_ov[:-1]
    ) / dt

    def A(x: Array) -> Array:
        """-Laplacian with zero-Dirichlet boundary (solver3d
        _laplacian_dirichlet), z neighbours via 1-plane halos."""
        vol = jnp.concatenate([halo_prev(x, 1), x, halo_next(x, 1)], axis=0)
        zp = jnp.pad(vol, ((0, 0), (1, 1), (1, 1)))
        lap = (
            zp[:-2, 1:-1, 1:-1]
            + zp[2:, 1:-1, 1:-1]
            + zp[1:-1, :-2, 1:-1]
            + zp[1:-1, 2:, 1:-1]
            + zp[1:-1, 1:-1, :-2]
            + zp[1:-1, 1:-1, 2:]
            - 6.0 * x
        )
        return -lap

    def gsum(x: Array) -> Array:
        return lax.psum(jnp.sum(x), axis)

    b_rhs = -div
    r = b_rhs - A(p)
    d_dir = r
    rs = gsum(r * r)

    def cg_body(_, carry):
        pp, r, d_dir, rs = carry
        Ad = A(d_dir)
        denom = gsum(d_dir * Ad)
        alpha = jnp.where(denom > 0, rs / (denom + 1e-30), 0.0)
        pp = pp + alpha * d_dir
        r = r - alpha * Ad
        rs_new = gsum(r * r)
        beta = jnp.where(rs > 0, rs_new / (rs + 1e-30), 0.0)
        d_dir = r + beta * d_dir
        return pp, r, d_dir, rs_new

    p, _, _, _ = lax.fori_loop(0, num_cg_iters, cg_body, (p, r, d_dir, rs))

    # velocity correction: u, v in-plane (local); w faces need
    # p[global g] - p[global g-1] for the slab's db+1 planes
    u = u.at[:, :, 1:-1].add(-dt * (p[:, :, 1:] - p[:, :, :-1]))
    v = v.at[:, 1:-1, :].add(-dt * (p[:, 1:, :] - p[:, :-1, :]))
    p_ext = jnp.concatenate(
        [halo_prev(p, 1), p, halo_next(p, 1)], axis=0
    )  # planes global a-1 .. b (halo garbage masked below)
    dw = p_ext[1:] - p_ext[:-1]  # dw[r] = p[a+r] - p[a+r-1]
    planes_g = a + lax.broadcasted_iota(jnp.int32, (db + 1, h, w), 0)
    w_mask = (planes_g >= 1) & (planes_g <= d - 1)
    w_ov = w_ov - jnp.where(w_mask, dt * dw, 0.0)

    # ---- 4. advection (cell-centred velocities, tent shifts) -------------
    uc = 0.5 * (u[:, :, :-1] + u[:, :, 1:])
    vc = 0.5 * (v[:, :-1, :] + v[:, 1:, :])
    wc = 0.5 * (w_ov[:-1] + w_ov[1:])

    zg = (a + lax.broadcasted_iota(jnp.int32, (db, h, w), 0)).astype(
        jnp.float32
    )
    yg = lax.broadcasted_iota(jnp.float32, (db, h, w), 1)
    xg = lax.broadcasted_iota(jnp.float32, (db, h, w), 2)

    def tent_advect(f: Array, uc_f, vc_f, wc_f) -> Array:
        """solver3d.advect3d's tent-shift path on a z slab: D-plane halos
        via ppermute, zeros past the global boundary (where the hat weights
        vanish anyway, exactly like the single-device zero pad)."""
        pz = jnp.clip(zg - dt * wc_f, 0, d - 1)
        py = jnp.clip(yg - dt * vc_f, 0, h - 1)
        px = jnp.clip(xg - dt * uc_f, 0, w - 1)
        f_ext = jnp.concatenate(
            [halo_prev(f, D), f, halo_next(f, D)], axis=0
        )
        f_ext = jnp.pad(f_ext, ((0, 0), (D, D), (D, D)))
        out = jnp.zeros_like(f)
        for dz in range(-D, D + 1):
            wz = _hat(pz - (zg + dz))
            for dy in range(-D, D + 1):
                wzy = wz * _hat(py - (yg + dy))
                for dx in range(-D, D + 1):
                    wx = _hat(px - (xg + dx))
                    shifted = lax.dynamic_slice(
                        f_ext, (D + dz, D + dy, D + dx), (db, h, w)
                    )
                    out = out + wzy * wx * shifted
        return out

    # sequential-update order matches step3d exactly
    uc_a = tent_advect(uc, uc, vc, wc)
    vc_a = tent_advect(vc, uc_a, vc, wc)
    wc_a = tent_advect(wc, uc_a, vc_a, wc)
    density = tent_advect(density, uc_a, vc_a, wc_a)

    # ---- restagger centred velocities back to faces ----------------------
    def restagger_inplane(c: Array, ax: int) -> Array:
        lo = lax.slice_in_dim(c, 0, 1, axis=ax)
        hi = lax.slice_in_dim(c, c.shape[ax] - 1, c.shape[ax], axis=ax)
        mids = 0.5 * (
            lax.slice_in_dim(c, 0, c.shape[ax] - 1, axis=ax)
            + lax.slice_in_dim(c, 1, c.shape[ax], axis=ax)
        )
        return jnp.concatenate([lo, mids, hi], axis=ax)

    u = restagger_inplane(uc_a, 2)
    v = restagger_inplane(vc_a, 1)
    # w: face plane g = 0.5*(wc[g-1] + wc[g]) for 1 <= g <= d-1; replicate
    # at the global boundary faces (plane 0 = wc[0], plane d = wc[d-1])
    wc_ext = jnp.concatenate(
        [halo_prev(wc_a, 1), wc_a, halo_next(wc_a, 1)], axis=0
    )  # planes global a-1 .. b
    mids = 0.5 * (wc_ext[:-1] + wc_ext[1:])  # mids[r] -> face plane a+r
    w_ov = jnp.where(planes_g == 0, wc_a[:1], mids)
    w_ov = jnp.where(planes_g == d, wc_a[-1:], w_ov)

    # ---- 5. decay --------------------------------------------------------
    return u, v, w_ov, p, density * 0.995


# --------------------------------------------------------------- wrapper
@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "dt", "viscosity", "buoyancy", "num_cg_iters", "max_disp",
        "axis_name",
    ),
)
def sharded_step3d(
    state: SimState3D,
    mesh: Mesh,
    dt: float = 0.01,
    viscosity: float = 0.001,
    buoyancy: float = 0.1,
    num_cg_iters: int = 30,
    max_disp: int = 1,
    axis_name: str = "space",
) -> SimState3D:
    """One full 3D solver step with the volume z-slab-sharded over
    `axis_name`. Drop-in equal to `solver3d.step3d` (up to CG dot reduction
    order). d must divide by the axis size."""
    S = mesh.shape[axis_name]
    d, h, w = state.density.shape

    w_ov = to_overlapped3d(state.w, S)
    fn = shard_map(
        functools.partial(
            _local_step3d,
            d=d,
            h=h,
            w=w,
            dt=dt,
            viscosity=viscosity,
            buoyancy=buoyancy,
            num_cg_iters=num_cg_iters,
            max_disp=max_disp,
            axis=axis_name,
        ),
        mesh=mesh,
        in_specs=(P(axis_name),) * 5,
        out_specs=(P(axis_name),) * 5,
        check_vma=False,
    )
    u, v, w_ov, p, density = fn(state.u, state.v, w_ov, state.p, state.density)
    return SimState3D(
        u=u, v=v, w=from_overlapped3d(w_ov, S), p=p, density=density
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "mesh", "num_steps", "num_cg_iters", "max_disp", "axis_name"
    ),
)
def sharded_multi_step3d(
    state: SimState3D,
    mesh: Mesh,
    num_steps: int,
    dt: float = 0.01,
    viscosity: float = 0.001,
    buoyancy: float = 0.1,
    num_cg_iters: int = 30,
    max_disp: int = 1,
    axis_name: str = "space",
) -> Tuple[SimState3D, Array]:
    """Jitted scan over `num_steps` domain-decomposed 3D steps; returns the
    final state and the z-sharded density trajectory [T, D, H, W]."""

    def body(s, _):
        s = sharded_step3d(
            s, mesh, dt=dt, viscosity=viscosity, buoyancy=buoyancy,
            num_cg_iters=num_cg_iters, max_disp=max_disp,
            axis_name=axis_name,
        )
        return s, s.density

    return lax.scan(body, state, None, length=num_steps)
