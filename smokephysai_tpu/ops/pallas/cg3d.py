"""VMEM-resident conjugate-gradient pressure solve for the 3D solver.

The ENTIRE volume stays in VMEM for all iterations: 128^3 f32 is
8.4 MB/field, and the solve holds 4 live fields (p, r, d, Ad) + b
(~42 MB) — under the v5e's 128 MB VMEM, so a single-program kernel
(no grid, no halos) runs the whole solve with one HBM read of {p0, div}
and one write of p.

Honest measurement (128^3, 30 iters, inside the jitted step loop): this
kernel is ON-PAR with the XLA path (442 vs 479 steps/s full-step rate) —
XLA already fuses the CG iteration chain well, and the concatenate-based
zero-shift stencil here costs VMEM copies that offset the saved HBM
traffic. Retained because (a) it is numerically exact vs
solver3d.cg_pressure (same zero-Dirichlet 7-point Laplacian, alpha/beta
guards, fixed iteration count; tests/test_pallas.py asserts element-wise
agreement), and (b) it is the building block for a future fully-fused 3D
step kernel where the solve composes with diffusion/advection in VMEM.
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

# one solve holds ~6 live volumes (p, b, r, d, Ad + a shifted temp);
# leave margin for Mosaic spills inside the stencil
_VMEM_LIMIT = 110 * 1024 * 1024
CG3D_BUDGET_BYTES = 80 * 1024 * 1024
_LIVE_FIELDS = 8


def fits_cg3d(shape) -> bool:
    """True when the whole-volume CG kernel fits the VMEM budget."""
    d, h, w = shape
    return d * h * w * 4 * _LIVE_FIELDS <= CG3D_BUDGET_BYTES and w % 128 == 0


def _neg_lap_dirichlet(x: Array) -> Array:
    """-Laplacian with p=0 outside the domain (zero-shift concatenates:
    the Mosaic-friendly form of solver3d._laplacian_dirichlet)."""
    d, h, w = x.shape
    zd = jnp.zeros((1, h, w), x.dtype)
    zh = jnp.zeros((d, 1, w), x.dtype)
    zw = jnp.zeros((d, h, 1), x.dtype)
    up = jnp.concatenate([zd, x[:-1]], axis=0)
    down = jnp.concatenate([x[1:], zd], axis=0)
    north = jnp.concatenate([zh, x[:, :-1]], axis=1)
    south = jnp.concatenate([x[:, 1:], zh], axis=1)
    west = jnp.concatenate([zw, x[:, :, :-1]], axis=2)
    east = jnp.concatenate([x[:, :, 1:], zw], axis=2)
    return -(up + down + north + south + west + east - 6.0 * x)


def _cg_kernel(p_ref, div_ref, out_ref, *, num_iters: int):
    b = -div_ref[...]
    p = p_ref[...]
    r = b - _neg_lap_dirichlet(p)
    d0 = r
    rs = jnp.sum(r * r)

    def body(_, carry):
        p, r, d, rs = carry
        Ad = _neg_lap_dirichlet(d)
        denom = jnp.sum(d * Ad)
        alpha = jnp.where(denom > 0, rs / (denom + 1e-30), 0.0)
        p = p + alpha * d
        r = r - alpha * Ad
        rs_new = jnp.sum(r * r)
        beta = jnp.where(rs > 0, rs_new / (rs + 1e-30), 0.0)
        d = r + beta * d
        return p, r, d, rs_new

    p, _, _, _ = lax.fori_loop(0, num_iters, body, (p, r, d0, rs))
    out_ref[...] = p


@functools.partial(jax.jit, static_argnames=("num_iters",))
def cg_pressure_pallas(p0: Array, div: Array, num_iters: int = 30) -> Array:
    """Drop-in for solver3d.cg_pressure (fixed-iteration matrix-free CG on
    -Lap p = -div), whole solve VMEM-resident."""
    return pl.pallas_call(
        functools.partial(_cg_kernel, num_iters=num_iters),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(p0.shape, p0.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=use_interpret(),
    )(p0, div)
