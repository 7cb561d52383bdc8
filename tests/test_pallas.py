"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU, compiled Mosaic on TPU — SURVEY.md §7 layer 1b)."""
import jax
import jax.numpy as jnp
import numpy as np

from smokephysai_tpu.ops.pallas.jacobi import jacobi_pressure_pallas
from smokephysai_tpu.ops.pallas.stencil import diffuse_pallas
from smokephysai_tpu.physics.solver import diffuse, jacobi_pressure, step
from smokephysai_tpu.physics import add_smoke_source, init_state


def test_jacobi_kernel_matches_xla():
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = jax.random.normal(k1, (64, 64))
    div = jax.random.normal(k2, (64, 64))
    expected = jacobi_pressure(p, div, 20)
    got = jacobi_pressure_pallas(p, div, 20)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)


def test_jacobi_kernel_warm_start_boundary():
    """Sweeps must read the true (possibly nonzero) boundary values of the
    warm-started p in the first iteration, like the reference."""
    p = jnp.ones((32, 32))
    div = jnp.zeros((32, 32))
    expected = jacobi_pressure(p, div, 1)
    got = jacobi_pressure_pallas(p, div, 1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_jacobi_large_grid_fallback():
    """Grids beyond the VMEM budget take the XLA fallback path."""
    p = jnp.zeros((2048, 2048))
    div = jnp.zeros((2048, 2048))
    out = jacobi_pressure_pallas(p, div, 2)
    assert out.shape == (2048, 2048)


def test_diffuse_kernel_matches_xla():
    f = jax.random.uniform(jax.random.PRNGKey(1), (64, 48))
    expected = diffuse(f, 0.01, 0.5)
    got = diffuse_pallas(f, 0.01, 0.5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)


def test_diffuse_kernel_staggered_shapes():
    """u is (h+1, w) and v is (h, w+1) (reference navier_stokes.py:27-28)."""
    for shape in [(65, 64), (64, 65)]:
        f = jax.random.uniform(jax.random.PRNGKey(2), shape)
        np.testing.assert_allclose(
            np.asarray(diffuse_pallas(f, 0.01, 0.001)),
            np.asarray(diffuse(f, 0.01, 0.001)),
            atol=1e-6,
        )


def test_full_step_pallas_matches_xla():
    s = init_state((64, 64))
    s = s.replace(
        density=add_smoke_source(s.density, 32.0, 20.0, radius=8.0, intensity=1.5)
    )
    s_xla = s
    s_pal = s
    for _ in range(3):
        s_xla = step(s_xla, dt=0.01, viscosity=0.001, use_pallas=False)
        s_pal = step(s_pal, dt=0.01, viscosity=0.001, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(s_pal.density), np.asarray(s_xla.density), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(s_pal.p), np.asarray(s_xla.p), atol=1e-5)


def test_flash_attention_matches_einsum():
    from smokephysai_tpu.ops.pallas.attention import flash_attention

    B, H, L, D = 2, 4, 256, 64
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    q, k, v = (jax.random.normal(kk, (B, H, L, D)) for kk in ks)
    scores = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(D)
    expected = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(scores, -1), v)
    got = flash_attention(q, k, v, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)


def test_flash_attention_temperature():
    from smokephysai_tpu.ops.pallas.attention import flash_attention

    B, H, L, D = 1, 2, 128, 32
    ks = jax.random.split(jax.random.PRNGKey(6), 3)
    q, k, v = (jax.random.normal(kk, (B, H, L, D)) for kk in ks)
    scores = jnp.einsum("bhid,bhjd->bhij", q, k) / (np.sqrt(D) * 1.5)
    expected = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(scores, -1), v)
    got = flash_attention(q, k, v, temperature=1.5, block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-5)
