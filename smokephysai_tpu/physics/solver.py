"""2D incompressible Navier-Stokes smoke solver, TPU-native.

Functional re-design of the reference solver
(reference: src/physics/navier_stokes.py:6-173). Same numerics — including
the reference's documented quirks, reproduced on purpose for output parity
(SURVEY.md §3.4):

  * buoyancy is added along the *w* slice of v: ``v[:, :-1] += dt*0.1*rho``
    (reference navier_stokes.py:154-155)
  * u is advected first and v is then advected with the *updated* u
    (reference navier_stokes.py:166-168)
  * each Jacobi sweep writes a zero-boundary p (Dirichlet p=0), and the
    solve warm-starts from the previous step's pressure
    (reference navier_stokes.py:139-145)
  * staggered-to-center velocity sampling uses +0.5 offsets with clamping
    (reference navier_stokes.py:97-109)

Everything is pure and jit/scan/vmap-friendly: state is a `SimState`
pytree, shapes are static, loops are `lax.fori_loop`/`lax.scan`.

The Jacobi pressure solve and diffusion stencils have fused Pallas TPU
kernels in `smokephysai_tpu.ops.pallas`; this module is the XLA reference
path that the kernels are verified against (and is itself fully fused by
XLA into a small number of loops).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import checkify

from .state import SimState

Array = jnp.ndarray


def init_state(grid_size: Tuple[int, int], dtype=jnp.float32) -> SimState:
    """Zero-initialised staggered grid (reference navier_stokes.py:24-35)."""
    h, w = grid_size
    return SimState(
        u=jnp.zeros((h + 1, w), dtype),
        v=jnp.zeros((h, w + 1), dtype),
        p=jnp.zeros((h, w), dtype),
        density=jnp.zeros((h, w), dtype),
    )


def add_smoke_source(
    density: Array, x: Array, y: Array, radius: float = 10.0, intensity: Array = 1.0
) -> Array:
    """Gaussian smoke blob, sigma = radius/3, truncated at `radius`
    (reference navier_stokes.py:37-48). `x`/`y`/`intensity` may be traced
    scalars so source placement can live inside jit/vmap.
    """
    h, w = density.shape[-2], density.shape[-1]
    y_grid = lax.broadcasted_iota(jnp.float32, (h, w), 0)
    x_grid = lax.broadcasted_iota(jnp.float32, (h, w), 1)
    dist = jnp.sqrt((x_grid - x) ** 2 + (y_grid - y) ** 2)
    sigma2 = 2.0 * (radius / 3.0) ** 2
    blob = intensity * jnp.exp(-(dist**2) / sigma2)
    return density + jnp.where(dist <= radius, blob, 0.0)


def diffuse(field: Array, dt: float, viscosity: float) -> Array:
    """Explicit-Euler diffusion with replicate-padded 5-point Laplacian
    (reference navier_stokes.py:50-72)."""
    padded = jnp.pad(field, 1, mode="edge")
    laplacian = (
        padded[:-2, 1:-1]
        + padded[2:, 1:-1]
        + padded[1:-1, :-2]
        + padded[1:-1, 2:]
        - 4.0 * field
    )
    return field + dt * viscosity * laplacian


def bilinear_interpolate(field: Array, y: Array, x: Array) -> Array:
    """Bilinear sample of `field` at float coords (y, x), corner-clamped
    (reference navier_stokes.py:111-131).

    Implemented as a flat gather: TPU XLA lowers the 4 corner lookups into
    one fused gather loop. The Pallas fast path lives in ops/pallas/advect.
    """
    h, w = field.shape
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.clip(x0 + 1, 0, w - 1)
    y1 = jnp.clip(y0 + 1, 0, h - 1)
    x0c = jnp.clip(x0, 0, w - 1)
    y0c = jnp.clip(y0, 0, h - 1)

    wa = (x1.astype(field.dtype) - x) * (y1.astype(field.dtype) - y)
    wb = (x - x0.astype(field.dtype)) * (y1.astype(field.dtype) - y)
    wc = (x1.astype(field.dtype) - x) * (y - y0.astype(field.dtype))
    wd = (x - x0.astype(field.dtype)) * (y - y0.astype(field.dtype))

    flat = field.reshape(-1)
    g = lambda yy, xx: jnp.take(flat, yy * w + xx, indices_are_sorted=False)
    return wa * g(y0c, x0c) + wb * g(y0c, x1) + wc * g(y1, x0c) + wd * g(y1, x1)


def _sample_u_at_centers(u: Array, y: Array, x: Array) -> Array:
    """u lives at (i, j+0.5); sample at cell centers via +0.5 x-offset
    (reference navier_stokes.py:97-102)."""
    x_u = jnp.clip(x + 0.5, 0, u.shape[1] - 1)
    return bilinear_interpolate(u, y, x_u)


def _sample_v_at_centers(v: Array, y: Array, x: Array) -> Array:
    """v lives at (i+0.5, j); sample at cell centers via +0.5 y-offset
    (reference navier_stokes.py:104-109)."""
    y_v = jnp.clip(y + 0.5, 0, v.shape[0] - 1)
    return bilinear_interpolate(v, y_v, x)


def _centered_u(u: Array, fh: int, fw: int) -> Array:
    """Static 2-tap form of `_sample_u_at_centers` on an integer (fh, fw)
    coordinate grid: 0.5*(u[i,j] + u[i,j+1]) for j <= uw-2, and exactly 0
    for j >= uw-1 — which is what the clamped bilinear evaluates to there
    (the corner weights cancel, reference navier_stokes.py:115-131). No
    gather: a fixed stencil the VPU eats for free."""
    uw = u.shape[1]
    ncols = min(fw, uw - 1)
    core = 0.5 * (u[:fh, :ncols] + u[:fh, 1 : ncols + 1])
    return jnp.pad(core, ((0, 0), (0, fw - ncols)))


def _centered_v(v: Array, fh: int, fw: int) -> Array:
    """Static 2-tap form of `_sample_v_at_centers`: 0.5*(v[i,j] + v[i+1,j])
    for i <= vh-2, exactly 0 for i >= vh-1 (same weight-cancellation)."""
    vh = v.shape[0]
    nrows = min(fh, vh - 1)
    core = 0.5 * (v[:nrows, :fw] + v[1 : nrows + 1, :fw])
    return jnp.pad(core, ((0, fh - nrows), (0, 0)))


def bilinear_shift_sample(
    field: Array, prev_y: Array, prev_x: Array, max_disp: int
) -> Array:
    """Bilinear sample via tent-kernel shift decomposition — the TPU fast
    path for semi-Lagrangian advection (SURVEY.md §7 'gather-heavy
    advection on TPU').

    out[i,j] = sum_{|di|,|dj| <= D} hat(prev_y-(i+di)) * hat(prev_x-(j+dj))
               * field[i+di, j+dj],  hat(t) = max(0, 1-|t|)

    which equals the clamped bilinear gather exactly whenever the backtrace
    displacement is < `max_disp` cells, but lowers to (2D+1)^2 fused
    shift+FMA passes on the VPU instead of a serialised gather. The
    reference's exact-edge zeroing (all four corner weights vanish when a
    clamped coordinate lands exactly on the last row/column,
    navier_stokes.py:115-131) is applied as a final mask.
    """
    h, w = field.shape
    y_c = lax.broadcasted_iota(field.dtype, (h, w), 0)
    x_c = lax.broadcasted_iota(field.dtype, (h, w), 1)
    D = max_disp
    padded = jnp.pad(field, D)  # zero pad: out-of-range taps have hat == 0

    out = jnp.zeros_like(field)
    for di in range(-D, D + 1):
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(prev_y - (y_c + di)))
        for dj in range(-D, D + 1):
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(prev_x - (x_c + dj)))
            shifted = lax.slice(
                padded, (D + di, D + dj), (D + di + h, D + dj + w)
            )
            out = out + wy * wx * shifted

    edge_zero = (prev_x < w - 1) & (prev_y < h - 1)
    return jnp.where(edge_zero, out, 0.0)


def advect(
    field: Array, u: Array, v: Array, dt: float, max_disp: int = 2
) -> Array:
    """Semi-Lagrangian advection: backtrace `X - dt*vel`, clamp, bilerp
    (reference navier_stokes.py:74-95).

    Default path is gather-free (static-stencil velocity centring + tent
    shift decomposition), exact vs the reference for backtrace displacements
    under `max_disp` cells. Measured buoyancy-driven sims peak around
    |vel| ~ 0.06 => displacements ~6e-4 cells at dt=0.01, so the default
    max_disp=2 has >3000x headroom. The envelope is GUARDED: a
    `checkify.debug_check` fires when max|dt*vel| >= max_disp (run the step
    under `utils.debug.checked` / checkify user_checks to arm it; free
    otherwise — XLA dead-code-eliminates the unused reduction). On a guard
    hit, raise max_disp or set 0 for the general gather path.
    """
    h, w = field.shape

    if max_disp <= 0:
        y_c = lax.broadcasted_iota(field.dtype, (h, w), 0)
        x_c = lax.broadcasted_iota(field.dtype, (h, w), 1)
        u_i = _sample_u_at_centers(u, y_c, x_c)
        v_i = _sample_v_at_centers(v, y_c, x_c)
        prev_x = jnp.clip(x_c - dt * u_i, 0, w - 1)
        prev_y = jnp.clip(y_c - dt * v_i, 0, h - 1)
        return bilinear_interpolate(field, prev_y, prev_x)

    y_c = lax.broadcasted_iota(field.dtype, (h, w), 0)
    x_c = lax.broadcasted_iota(field.dtype, (h, w), 1)
    u_i = _centered_u(u, h, w)
    v_i = _centered_v(v, h, w)
    disp = jnp.maximum(jnp.max(jnp.abs(dt * u_i)), jnp.max(jnp.abs(dt * v_i)))
    checkify.debug_check(
        disp < max_disp,
        "tent-shift advection displacement {d} cells >= max_disp="
        f"{max_disp} — result is INEXACT vs the bilinear gather; raise "
        "max_disp or set max_disp=0 (general gather path)",
        d=disp,
    )
    prev_x = jnp.clip(x_c - dt * u_i, 0, w - 1)
    prev_y = jnp.clip(y_c - dt * v_i, 0, h - 1)
    return bilinear_shift_sample(field, prev_y, prev_x, max_disp)


def divergence(u: Array, v: Array, dt: float) -> Array:
    """Face-difference divergence scaled by 1/dt
    (reference navier_stokes.py:136)."""
    return (u[1:, :] - u[:-1, :] + v[:, 1:] - v[:, :-1]) / dt


def jacobi_pressure(p: Array, div: Array, num_iters: int = 20) -> Array:
    """`num_iters` Jacobi sweeps of the pressure Poisson equation with a
    zero-Dirichlet boundary re-imposed every sweep
    (reference navier_stokes.py:139-145)."""

    def sweep(_, p):
        interior = 0.25 * (
            p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] - div[1:-1, 1:-1]
        )
        p_new = jnp.zeros_like(p)
        return p_new.at[1:-1, 1:-1].set(interior)

    return lax.fori_loop(0, num_iters, sweep, p)


def pressure_projection(
    state: SimState, dt: float, num_iters: int = 20, jacobi_fn=None
) -> SimState:
    """Divergence → Jacobi solve → interior velocity correction
    (reference navier_stokes.py:133-149). `jacobi_fn` lets callers swap in
    the fused Pallas kernel (same signature as `jacobi_pressure`)."""
    div = divergence(state.u, state.v, dt)
    solve = jacobi_fn if jacobi_fn is not None else jacobi_pressure
    p = solve(state.p, div, num_iters)
    u = state.u.at[1:-1, :].add(-dt * (p[1:, :] - p[:-1, :]))
    v = state.v.at[:, 1:-1].add(-dt * (p[:, 1:] - p[:, :-1]))
    return state.replace(u=u, v=v, p=p)


def vorticity_confinement(state: SimState, dt: float, eps: float) -> SimState:
    """Optional vorticity-confinement force (Fedkiw et al. 2001).

    Not present in the reference solver; enabled by the 256² build config
    (BASELINE.json configs[1]). Re-injects small-scale rotational motion
    that the first-order semi-Lagrangian scheme damps out.
    Cell-centred: w = dv/dx - du/dy, N = grad|w| normalised,
    force = eps * (N x w), applied to the staggered faces it borders.
    """
    h, w = state.density.shape
    y_c = lax.broadcasted_iota(state.u.dtype, (h, w), 0)
    x_c = lax.broadcasted_iota(state.u.dtype, (h, w), 1)
    uc = _sample_u_at_centers(state.u, y_c, x_c)
    vc = _sample_v_at_centers(state.v, y_c, x_c)

    def ddx(f):
        fp = jnp.pad(f, ((0, 0), (1, 1)), mode="edge")
        return 0.5 * (fp[:, 2:] - fp[:, :-2])

    def ddy(f):
        fp = jnp.pad(f, ((1, 1), (0, 0)), mode="edge")
        return 0.5 * (fp[2:, :] - fp[:-2, :])

    w_z = ddx(vc) - ddy(uc)
    aw = jnp.abs(w_z)
    nx, ny = ddx(aw), ddy(aw)
    mag = jnp.sqrt(nx * nx + ny * ny) + 1e-6
    nx, ny = nx / mag, ny / mag
    fx = eps * (ny * w_z)
    fy = eps * (-nx * w_z)
    u = state.u.at[:-1, :].add(dt * fx)
    v = state.v.at[:, :-1].add(dt * fy)
    return state.replace(u=u, v=v)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_jacobi_iters", "vorticity_eps", "use_pallas", "max_disp"
    ),
)
def step(
    state: SimState,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    vorticity_eps: float = 0.0,
    use_pallas: bool = False,
    max_disp: int | None = None,
) -> SimState:
    """One solver step: buoyancy → diffusion → projection → advection →
    decay (reference navier_stokes.py:151-173, order preserved exactly).

    `use_pallas=True` routes the whole step through ONE fused VMEM-resident
    Pallas kernel when the grid fits and vorticity confinement is off
    (ops/pallas/fused_step.py), else through the per-op Jacobi/diffusion
    kernels; numerics match the XLA path either way. `vorticity_eps` is a
    trace-time constant (config value) so the fused-path choice and the
    confinement branch compile away.

    `max_disp` bounds the tent-shift advection displacement (cells/step).
    The default (None) means policy choice per path: 2 taps-wide on the
    XLA path, 1 on the fused kernel — bit-identical whenever displacements
    stay under 1 cell (measured buoyancy-driven sims peak ~6e-4) at a third
    of the tap count. An explicit integer is honoured verbatim on BOTH
    paths, so passing max_disp=2 forces the 25-tap fused kernel too.
    `max_disp=0` selects the general gather path (never fused).
    """
    if use_pallas and vorticity_eps == 0.0 and (
        max_disp is None or max_disp > 0
    ):
        from smokephysai_tpu.ops.pallas import fused_step as _pf

        if _pf.fits_fused_step(state.density.shape):
            u, v, p, d = _pf.fused_step_pallas(
                state.u, state.v, state.p, state.density,
                dt, viscosity, num_jacobi_iters,
                max_disp=1 if max_disp is None else max_disp,
            )
            return state.replace(u=u, v=v, p=p, density=d)
    if max_disp is None:
        max_disp = 2

    jacobi_fn = None
    diffuse_fn = diffuse
    if use_pallas:
        from smokephysai_tpu.ops.pallas import jacobi as _pj
        from smokephysai_tpu.ops.pallas import stencil as _ps

        jacobi_fn = _pj.jacobi_pressure_pallas
        diffuse_fn = _ps.diffuse_pallas

    # 1. buoyancy — reference quirk: added along the w slice of v
    #    (navier_stokes.py:154-155)
    buoyancy = state.density * 0.1
    v = state.v.at[:, :-1].add(dt * buoyancy)
    state = state.replace(v=v)

    # optional vorticity confinement (off by default for reference parity)
    if vorticity_eps > 0.0:
        state = vorticity_confinement(state, dt, vorticity_eps)

    # 2. diffusion (navier_stokes.py:158-160)
    state = state.replace(
        u=diffuse_fn(state.u, dt, viscosity),
        v=diffuse_fn(state.v, dt, viscosity),
        density=diffuse_fn(state.density, dt, viscosity * 0.1),
    )

    # 3. pressure projection (navier_stokes.py:162-163)
    state = pressure_projection(state, dt, num_jacobi_iters, jacobi_fn=jacobi_fn)

    # 4. advection — sequential-update quirk: v sees updated u, density sees
    #    updated u and v (navier_stokes.py:166-168)
    u = advect(state.u, state.u, state.v, dt, max_disp=max_disp)
    v = advect(state.v, u, state.v, dt, max_disp=max_disp)
    density = advect(state.density, u, v, dt, max_disp=max_disp)

    # 5. density decay (navier_stokes.py:171)
    return state.replace(u=u, v=v, density=density * 0.995)


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_steps", "num_jacobi_iters", "vorticity_eps", "use_pallas",
        "max_disp",
    ),
)
def multi_step(
    state: SimState,
    num_steps: int,
    dt: float = 0.01,
    viscosity: float = 0.001,
    num_jacobi_iters: int = 20,
    vorticity_eps: float = 0.0,
    use_pallas: bool = False,
    max_disp: int | None = None,
) -> Tuple[SimState, Array]:
    """`lax.scan` over `num_steps` solver steps; returns the final state and
    the stacked density trajectory [T, H, W]. This is the fused time loop
    the eager reference cannot express (SURVEY.md §7, layer 1a).

    With `use_pallas` (and no vorticity confinement) the ENTIRE time loop
    runs inside one VMEM-resident Pallas kernel when state + trajectory fit
    — the fields never touch HBM between steps (ops/pallas/fused_step.py).
    `max_disp` follows `step`'s policy: None → 2 XLA / 1 fused; an explicit
    integer is honoured verbatim on both paths.
    """
    if use_pallas and vorticity_eps == 0.0 and (
        max_disp is None or max_disp > 0
    ):
        from smokephysai_tpu.ops.pallas import fused_step as _pf

        if _pf.fits_fused_step(state.density.shape, traj_steps=num_steps):
            (u, v, p, d), traj = _pf.fused_multi_step_pallas(
                state.u, state.v, state.p, state.density,
                num_steps, dt, viscosity, num_jacobi_iters,
                max_disp=1 if max_disp is None else max_disp,
            )
            return state.replace(u=u, v=v, p=p, density=d), traj

    def body(s, _):
        s = step(
            s,
            dt=dt,
            viscosity=viscosity,
            num_jacobi_iters=num_jacobi_iters,
            vorticity_eps=vorticity_eps,
            use_pallas=use_pallas,
            max_disp=max_disp,
        )
        return s, s.density

    return lax.scan(body, state, None, length=num_steps)
