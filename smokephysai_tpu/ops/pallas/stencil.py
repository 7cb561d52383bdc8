"""Fused diffusion stencil kernel (replicate-padded 5-point Laplacian,
reference navier_stokes.py:50-72).

One VMEM-resident pass: load the field once, apply the explicit-Euler
diffusion update, write once. The coefficient dt*viscosity arrives as a
traced (1,1) SMEM scalar so the kernel is shape-cached across dt/viscosity
values.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import use_interpret

Array = jnp.ndarray

VMEM_BUDGET_BYTES = 12 * 1024 * 1024


def _diffuse_kernel(coef_ref, f_ref, out_ref):
    f = f_ref[:]
    h, w = f.shape
    # replicate-pad shifts (edge rows/cols reuse themselves)
    up = jnp.concatenate([f[:1, :], f[:-1, :]], axis=0)
    down = jnp.concatenate([f[1:, :], f[-1:, :]], axis=0)
    left = jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
    right = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    laplacian = up + down + left + right - 4.0 * f
    out_ref[:] = f + coef_ref[0, 0] * laplacian


def diffuse_pallas(field: Array, dt, viscosity) -> Array:
    """Drop-in for solver.diffuse; XLA fallback beyond the VMEM budget."""
    h, w = field.shape
    if 2 * h * w * field.dtype.itemsize > VMEM_BUDGET_BYTES:
        from smokephysai_tpu.physics.solver import diffuse

        return diffuse(field, dt, viscosity)

    coef = jnp.asarray(dt * viscosity, field.dtype).reshape(1, 1)
    return pl.pallas_call(
        _diffuse_kernel,
        out_shape=jax.ShapeDtypeStruct(field.shape, field.dtype),
        in_specs=[
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=use_interpret(),
    )(coef, field)
