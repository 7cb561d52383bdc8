"""Fractal perturbation fields (Perlin-style trig noise + Mandelbrot).

Re-design of reference src/physics/fractal_generator.py:5-62. Semantics are
matched exactly (including the reference's `indexing='ij'` meshgrid over
(x, y), which makes the fields the transpose of image orientation; it only
type-checks for square grids, which is all the reference ever uses).

Key TPU-side change: the combined fractal field is *input independent* —
the reference recomputes a 100-iteration Mandelbrot escape field every
simulation step (fractal_generator.py:33-51 called from
smoke_simulator.py:38). Here it is computed once per (shape, scale,
iterations) and cached; applying the perturbation is then a single fused
multiply-add.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def perlin_noise(shape: Tuple[int, int], scale: float = 10.0) -> Array:
    """6-octave sin*cos 'Perlin' noise, normalised to [0, 1]
    (reference fractal_generator.py:12-31)."""
    h, w = shape
    x = jnp.linspace(0.0, scale, w)
    y = jnp.linspace(0.0, scale, h)
    X, Y = jnp.meshgrid(x, y, indexing="ij")  # (w, h): reference orientation

    noise = jnp.zeros_like(X)
    amplitude, frequency = 1.0, 1.0
    for _ in range(6):
        noise = noise + amplitude * jnp.sin(frequency * X) * jnp.cos(frequency * Y)
        amplitude *= 0.5
        frequency *= 2.0
    return (noise + 1.0) / 2.0


def mandelbrot_field(shape: Tuple[int, int], iterations: int = 100) -> Array:
    """Mandelbrot escape-count field over [-2.5,1.5]x[-1.5,1.5], divided by
    `iterations` (reference fractal_generator.py:33-51). Escape count is the
    last iteration index at which |z| <= 2, exactly as the reference's
    masked in-place update computes it."""
    h, w = shape
    x = jnp.linspace(-2.5, 1.5, w)
    y = jnp.linspace(-1.5, 1.5, h)
    X, Y = jnp.meshgrid(x, y, indexing="ij")  # (w, h): reference orientation

    # real-pair complex arithmetic (z = zx + i*zy): TPU backends lack
    # complex dtypes, and the VPU prefers two f32 lanes anyway.
    # |z| <= 2  <=>  zx^2 + zy^2 <= 4 (sqrt-free).
    def body(i, carry):
        zx, zy, esc = carry
        mask = zx * zx + zy * zy <= 4.0
        new_zx = zx * zx - zy * zy + X
        new_zy = 2.0 * zx * zy + Y
        zx = jnp.where(mask, new_zx, zx)
        zy = jnp.where(mask, new_zy, zy)
        esc = jnp.where(mask, jnp.float32(i), esc)
        return zx, zy, esc

    zx0 = jnp.zeros(X.shape, jnp.float32)
    zy0 = jnp.zeros(X.shape, jnp.float32)
    esc0 = jnp.zeros(X.shape, jnp.float32)
    _, _, esc = lax.fori_loop(0, iterations, body, (zx0, zy0, esc0))
    return esc / iterations


@functools.lru_cache(maxsize=16)
def fractal_field(
    shape: Tuple[int, int], scale: float = 10.0, iterations: int = 100
) -> Array:
    """Cached 0.7*perlin + 0.3*mandelbrot blend
    (reference fractal_generator.py:53-59). Input-independent, so computed
    once per grid size instead of once per step.

    Evaluated eagerly even when first called under a jit trace
    (ensure_compile_time_eval), so the cache always holds a concrete host
    constant that folds into downstream compilations."""
    with jax.ensure_compile_time_eval():
        field = 0.7 * perlin_noise(shape, scale) + 0.3 * mandelbrot_field(
            shape, iterations
        )
        return jax.device_get(field)


def apply_fractal_perturbation(
    field: Array, intensity: float = 0.1, fractal: Array | None = None
) -> Array:
    """Multiplicative perturbation: field * (1 + intensity * F)
    (reference fractal_generator.py:53-62)."""
    if fractal is None:
        fractal = jnp.asarray(fractal_field(tuple(field.shape[-2:])))
    return field * (1.0 + intensity * fractal)
