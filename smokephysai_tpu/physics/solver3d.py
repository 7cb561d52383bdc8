"""3D incompressible smoke solver with conjugate-gradient pressure solve.

New capability for the 128^3 volume config (BASELINE.json configs[3]; the
reference is strictly 2D). Design extends the 2D solver's scheme —
semi-Lagrangian advection, explicit diffusion, buoyancy, 0.995 decay — to a
properly staggered 3D MAC grid, and replaces Jacobi with matrix-free CG on
the 7-point pressure Laplacian (CG named explicitly by BASELINE.json).

TPU notes: advection defaults to the gather-free tent-shift decomposition
(trilinear_shift_sample, the 3D analogue of the 2D fast path — the flat
trilinear gather made 128^3 advection-bound at 567 ms/step); CG is
matvec + dots (VPU reductions); everything scans/jits. The last axis (w)
should be a multiple of 128 for lane alignment (128^3 is).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import checkify
from flax import struct

Array = jnp.ndarray


@struct.dataclass
class SimState3D:
    """Staggered MAC fields: u x-faces (d,h,w+1), v y-faces (d,h+1,w),
    w z-faces (d+1,h,w); p, density cell-centred (d,h,w)."""

    u: Array
    v: Array
    w: Array
    p: Array
    density: Array


def init_state3d(grid_size: Tuple[int, int, int], dtype=jnp.float32) -> SimState3D:
    d, h, w = grid_size
    return SimState3D(
        u=jnp.zeros((d, h, w + 1), dtype),
        v=jnp.zeros((d, h + 1, w), dtype),
        w=jnp.zeros((d + 1, h, w), dtype),
        p=jnp.zeros((d, h, w), dtype),
        density=jnp.zeros((d, h, w), dtype),
    )


def add_smoke_source3d(
    density: Array, x, y, z, radius: float = 8.0, intensity=1.0
) -> Array:
    """Truncated Gaussian blob, sigma = radius/3 (3D analogue of the 2D
    source, reference navier_stokes.py:37-48)."""
    d, h, w = density.shape
    zg = lax.broadcasted_iota(jnp.float32, (d, h, w), 0)
    yg = lax.broadcasted_iota(jnp.float32, (d, h, w), 1)
    xg = lax.broadcasted_iota(jnp.float32, (d, h, w), 2)
    dist2 = (xg - x) ** 2 + (yg - y) ** 2 + (zg - z) ** 2
    blob = intensity * jnp.exp(-dist2 / (2.0 * (radius / 3.0) ** 2))
    return density + jnp.where(dist2 <= radius**2, blob, 0.0)


def diffuse3d(field: Array, dt: float, viscosity: float) -> Array:
    """Explicit 7-point Laplacian diffusion, replicate-padded."""
    p = jnp.pad(field, 1, mode="edge")
    lap = (
        p[:-2, 1:-1, 1:-1]
        + p[2:, 1:-1, 1:-1]
        + p[1:-1, :-2, 1:-1]
        + p[1:-1, 2:, 1:-1]
        + p[1:-1, 1:-1, :-2]
        + p[1:-1, 1:-1, 2:]
        - 6.0 * field
    )
    return field + dt * viscosity * lap


def trilinear_interpolate(field: Array, z: Array, y: Array, x: Array) -> Array:
    """Trilinear sample at float coords, corner-clamped; one flat gather."""
    d, h, w = field.shape
    z0 = jnp.floor(z).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x0 = jnp.floor(x).astype(jnp.int32)
    z1 = jnp.clip(z0 + 1, 0, d - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    z0c = jnp.clip(z0, 0, d - 1)
    y0c = jnp.clip(y0, 0, h - 1)
    x0c = jnp.clip(x0, 0, w - 1)

    fz = z - z0.astype(field.dtype)
    fy = y - y0.astype(field.dtype)
    fx = x - x0.astype(field.dtype)

    flat = field.reshape(-1)
    g = lambda zz, yy, xx: jnp.take(flat, (zz * h + yy) * w + xx)

    c000, c001 = g(z0c, y0c, x0c), g(z0c, y0c, x1)
    c010, c011 = g(z0c, y1, x0c), g(z0c, y1, x1)
    c100, c101 = g(z1, y0c, x0c), g(z1, y0c, x1)
    c110, c111 = g(z1, y1, x0c), g(z1, y1, x1)

    c00 = c000 * (1 - fx) + c001 * fx
    c01 = c010 * (1 - fx) + c011 * fx
    c10 = c100 * (1 - fx) + c101 * fx
    c11 = c110 * (1 - fx) + c111 * fx
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fz) + c1 * fz


def trilinear_shift_sample(
    field: Array, pz: Array, py: Array, px: Array, max_disp: int
) -> Array:
    """Trilinear sample via tent-kernel shift decomposition — the 3D
    counterpart of the 2D TPU fast path (solver.py bilinear_shift_sample):

      out[k,i,j] = sum_{|dz|,|dy|,|dx| <= D} hat(pz-(k+dz)) * hat(py-(i+dy))
                   * hat(px-(j+dx)) * field[k+dz, i+dy, j+dx]

    with hat(t) = max(0, 1-|t|). Equals the corner-clamped trilinear gather
    exactly whenever the backtrace displacement is < `max_disp` cells
    (coords are pre-clamped to [0, dim-1], so boundary taps coincide with
    the clamped gather too), but lowers to (2D+1)^3 fused shift+FMA sweeps
    on the VPU instead of a serialised 8-corner gather over the volume —
    the gather made 128^3 advection-bound (567 ms/step, ~75% in gathers).
    """
    d, h, w = field.shape
    zc = lax.broadcasted_iota(field.dtype, (d, h, w), 0)
    yc = lax.broadcasted_iota(field.dtype, (d, h, w), 1)
    xc = lax.broadcasted_iota(field.dtype, (d, h, w), 2)
    D = max_disp
    padded = jnp.pad(field, D)  # zero pad: out-of-range taps have hat == 0

    out = jnp.zeros_like(field)
    for dz in range(-D, D + 1):
        wz = jnp.maximum(0.0, 1.0 - jnp.abs(pz - (zc + dz)))
        for dy in range(-D, D + 1):
            wzy = wz * jnp.maximum(0.0, 1.0 - jnp.abs(py - (yc + dy)))
            for dx in range(-D, D + 1):
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(px - (xc + dx)))
                shifted = lax.slice(
                    padded,
                    (D + dz, D + dy, D + dx),
                    (D + dz + d, D + dy + h, D + dx + w),
                )
                out = out + wzy * wx * shifted
    return out


def _centered_velocities(state: SimState3D) -> Tuple[Array, Array, Array]:
    uc = 0.5 * (state.u[:, :, :-1] + state.u[:, :, 1:])
    vc = 0.5 * (state.v[:, :-1, :] + state.v[:, 1:, :])
    wc = 0.5 * (state.w[:-1, :, :] + state.w[1:, :, :])
    return uc, vc, wc


def advect3d(
    field: Array, uc: Array, vc: Array, wc: Array, dt: float,
    max_disp: int = 1,
) -> Array:
    """Semi-Lagrangian backtrace with cell-centred velocities (cell-centred
    fields only; velocities are advected via their centred form then
    re-staggered in `step3d`).

    Default path is gather-free (tent shift decomposition, exact for
    displacements < `max_disp` cells; measured 3D sims peak ~6e-4 cells at
    dt=0.01, so max_disp=1 has >1000x headroom). The envelope is GUARDED:
    a `checkify.debug_check` fires when max|dt*vel| >= max_disp (arm via
    checkify user_checks, e.g. `utils.debug.checked`; free under plain jit
    — the unused reduction is dead-code-eliminated). Set max_disp=0 for the
    general trilinear-gather path."""
    d, h, w = field.shape
    zg = lax.broadcasted_iota(field.dtype, (d, h, w), 0)
    yg = lax.broadcasted_iota(field.dtype, (d, h, w), 1)
    xg = lax.broadcasted_iota(field.dtype, (d, h, w), 2)
    pz = jnp.clip(zg - dt * wc, 0, d - 1)
    py = jnp.clip(yg - dt * vc, 0, h - 1)
    px = jnp.clip(xg - dt * uc, 0, w - 1)
    if max_disp > 0:
        disp = jnp.max(
            jnp.stack([
                jnp.max(jnp.abs(dt * uc)),
                jnp.max(jnp.abs(dt * vc)),
                jnp.max(jnp.abs(dt * wc)),
            ])
        )
        checkify.debug_check(
            disp < max_disp,
            "tent-shift 3D advection displacement {d} cells >= max_disp="
            f"{max_disp} — result is INEXACT vs the trilinear gather; "
            "raise max_disp or set max_disp=0 (general gather path)",
            d=disp,
        )
        return trilinear_shift_sample(field, pz, py, px, max_disp)
    return trilinear_interpolate(field, pz, py, px)


def divergence3d(state: SimState3D, dt: float) -> Array:
    return (
        state.u[:, :, 1:]
        - state.u[:, :, :-1]
        + state.v[:, 1:, :]
        - state.v[:, :-1, :]
        + state.w[1:, :, :]
        - state.w[:-1, :, :]
    ) / dt


def _laplacian_dirichlet(p: Array) -> Array:
    """7-point Laplacian with p=0 outside the domain (Dirichlet), matching
    the 2D solver's zero-boundary convention."""
    z = jnp.pad(p, 1)  # zero pad
    return (
        z[:-2, 1:-1, 1:-1]
        + z[2:, 1:-1, 1:-1]
        + z[1:-1, :-2, 1:-1]
        + z[1:-1, 2:, 1:-1]
        + z[1:-1, 1:-1, :-2]
        + z[1:-1, 1:-1, 2:]
        - 6.0 * p
    )


def cg_pressure(
    p0: Array, div: Array, num_iters: int = 30, tol: float = 1e-4
) -> Array:
    """Matrix-free conjugate gradient on -Lap(p) = -div (SPD form).
    Fixed-iteration loop with early stalling via residual mask — jit-stable
    shapes, no host sync."""
    b = -div

    def A(x):
        return -_laplacian_dirichlet(x)

    r = b - A(p0)
    d0 = r
    rs = jnp.sum(r * r)

    def body(_, carry):
        p, r, d, rs = carry
        Ad = A(d)
        denom = jnp.sum(d * Ad)
        alpha = jnp.where(denom > 0, rs / (denom + 1e-30), 0.0)
        p = p + alpha * d
        r = r - alpha * Ad
        rs_new = jnp.sum(r * r)
        beta = jnp.where(rs > 0, rs_new / (rs + 1e-30), 0.0)
        d = r + beta * d
        return p, r, d, rs_new

    p, _, _, _ = lax.fori_loop(0, num_iters, body, (p0, r, d0, rs))
    return p


@functools.partial(
    jax.jit,
    static_argnames=("num_cg_iters", "max_disp", "use_pallas", "pressure_solver"),
)
def step3d(
    state: SimState3D,
    dt: float = 0.01,
    viscosity: float = 0.001,
    buoyancy: float = 0.1,
    num_cg_iters: int = 30,
    max_disp: int = 1,
    use_pallas: bool = False,
    pressure_solver: str = "cg",
) -> SimState3D:
    """One 3D step: buoyancy (vertical w faces) -> diffusion -> CG pressure
    projection -> advection -> 0.995 decay (stage order mirrors the 2D
    reference step, navier_stokes.py:151-173).

    pressure_solver="mg" swaps CG for the geometric-multigrid solve
    (physics/multigrid3d.py) — ~2.6x less stencil work and no global
    reductions for the same residual; num_cg_iters then means V-cycles/15
    (30 CG iters ~ 2 cycles, keeping the one knob roughly
    accuracy-equivalent across solvers)."""
    # 1. buoyancy on vertical faces adjacent to each cell
    w_vel = state.w.at[:-1, :, :].add(dt * buoyancy * state.density)
    state = state.replace(w=w_vel)

    # 2. diffusion
    state = state.replace(
        u=diffuse3d(state.u, dt, viscosity),
        v=diffuse3d(state.v, dt, viscosity),
        w=diffuse3d(state.w, dt, viscosity),
        density=diffuse3d(state.density, dt, viscosity * 0.1),
    )

    # 3. CG pressure projection. use_pallas routes through the VMEM-resident
    # whole-volume CG kernel (ops/pallas/cg3d.py) when the volume fits —
    # the XLA path streams ~2 GB of HBM per solve at 128^3.
    div = divergence3d(state, dt)
    if pressure_solver == "mg":
        from smokephysai_tpu.physics.multigrid3d import mg_pressure

        p = mg_pressure(state.p, div, num_cycles=max(1, num_cg_iters // 15))
    elif use_pallas:
        from smokephysai_tpu.ops.pallas.cg3d import cg_pressure_pallas, fits_cg3d

        if fits_cg3d(div.shape):
            p = cg_pressure_pallas(state.p, div, num_cg_iters)
        else:
            p = cg_pressure(state.p, div, num_cg_iters)
    else:
        p = cg_pressure(state.p, div, num_cg_iters)
    u = state.u.at[:, :, 1:-1].add(-dt * (p[:, :, 1:] - p[:, :, :-1]))
    v = state.v.at[:, 1:-1, :].add(-dt * (p[:, 1:, :] - p[:, :-1, :]))
    w_vel = state.w.at[1:-1, :, :].add(-dt * (p[1:, :, :] - p[:-1, :, :]))
    state = state.replace(u=u, v=v, w=w_vel, p=p)

    # 4. advection (centred velocities; sequential update like 2D)
    uc, vc, wc = _centered_velocities(state)
    uc_a = advect3d(uc, uc, vc, wc, dt, max_disp)
    vc_a = advect3d(vc, uc_a, vc, wc, dt, max_disp)
    wc_a = advect3d(wc, uc_a, vc_a, wc, dt, max_disp)
    density = advect3d(state.density, uc_a, vc_a, wc_a, dt, max_disp)

    # re-stagger centred velocities back to faces (interior average,
    # replicate at boundary faces)
    def restagger(c, axis):
        lo = jnp.take(c, jnp.array([0]), axis=axis)
        hi = jnp.take(c, jnp.array([c.shape[axis] - 1]), axis=axis)
        mids = 0.5 * (
            lax.slice_in_dim(c, 0, c.shape[axis] - 1, axis=axis)
            + lax.slice_in_dim(c, 1, c.shape[axis], axis=axis)
        )
        return jnp.concatenate([lo, mids, hi], axis=axis)

    u = restagger(uc_a, 2)
    v = restagger(vc_a, 1)
    w_vel = restagger(wc_a, 0)

    # 5. decay
    return state.replace(u=u, v=v, w=w_vel, density=density * 0.995)


def multi_step3d(
    state: SimState3D,
    num_steps: int,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_cg_iters: int = 30,
    max_disp: int = 1,
    use_pallas: bool = False,
    pressure_solver: str = "cg",
) -> Tuple[SimState3D, Array]:
    """Scan over steps; returns final state + density trajectory."""

    def body(s, _):
        s = step3d(s, dt=dt, viscosity=viscosity, num_cg_iters=num_cg_iters,
                   max_disp=max_disp, use_pallas=use_pallas,
                   pressure_solver=pressure_solver)
        return s, s.density

    return lax.scan(body, state, None, length=num_steps)
