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


def test_fused_step_kernel_matches_xla():
    """Whole-step fused kernel == solver.step pipeline (buoyancy through
    decay) on a developed flow."""
    from smokephysai_tpu.ops.pallas.fused_step import fused_step_pallas

    s = init_state((64, 64))
    s = s.replace(density=add_smoke_source(s.density, 30.0, 28.0, intensity=1.5))
    for _ in range(3):
        s = step(s)
    ref = step(s)
    u, v, p, d = fused_step_pallas(s.u, s.v, s.p, s.density, 0.01, 0.001)
    np.testing.assert_allclose(np.asarray(u), np.asarray(ref.u), atol=1e-6)
    np.testing.assert_allclose(np.asarray(v), np.asarray(ref.v), atol=1e-6)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref.p), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(d), np.asarray(ref.density), atol=1e-6
    )


def test_fused_multi_step_kernel_matches_scan():
    """Whole-episode kernel (time loop in VMEM) == scan of XLA steps,
    including the recorded density trajectory."""
    from smokephysai_tpu.physics.solver import multi_step
    from smokephysai_tpu.ops.pallas.fused_step import fused_multi_step_pallas

    s = init_state((64, 64))
    s = s.replace(density=add_smoke_source(s.density, 20.0, 40.0, intensity=2.0))
    ref_state, ref_traj = multi_step(s, 6)
    (u, v, p, d), traj = fused_multi_step_pallas(s.u, s.v, s.p, s.density, 6)
    np.testing.assert_allclose(np.asarray(traj), np.asarray(ref_traj), atol=1e-5)
    np.testing.assert_allclose(np.asarray(d), np.asarray(ref_state.density), atol=1e-5)
    np.testing.assert_allclose(np.asarray(p), np.asarray(ref_state.p), atol=1e-4)


def test_multi_step_use_pallas_routes_fused():
    """solver.multi_step(use_pallas=True) equals the XLA path (it fuses the
    whole episode when state + trajectory fit VMEM)."""
    from smokephysai_tpu.physics.solver import multi_step

    s = init_state((64, 64))
    s = s.replace(density=add_smoke_source(s.density, 32.0, 32.0, intensity=1.0))
    ref_state, ref_traj = multi_step(s, 5, use_pallas=False)
    got_state, got_traj = multi_step(s, 5, use_pallas=True)
    np.testing.assert_allclose(
        np.asarray(got_traj), np.asarray(ref_traj), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_state.u), np.asarray(ref_state.u), atol=1e-6
    )


def test_jacobi_tiled_beyond_vmem_bit_exact():
    """1024^2 exceeds the whole-grid VMEM budget; the overlapping-halo
    row-striped kernel must be BIT-exact vs the global XLA sweep (a
    num_iters-deep halo reproduces the sweep-by-sweep dependency cone)."""
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    p = jax.random.normal(k1, (1024, 1024))
    div = jax.random.normal(k2, (1024, 1024))
    ref = jacobi_pressure(p, div, 20)
    got = jacobi_pressure_pallas(p, div, 20)
    assert bool(jnp.all(got == ref))


class TestCG3DPallas:
    """Whole-volume VMEM-resident CG (ops/pallas/cg3d.py) must be
    element-wise exact vs solver3d.cg_pressure."""

    def test_matches_xla_cg(self):
        from smokephysai_tpu.ops.pallas.cg3d import cg_pressure_pallas
        from smokephysai_tpu.physics.solver3d import cg_pressure

        div = jax.random.normal(jax.random.PRNGKey(3), (8, 8, 128))
        p0 = jnp.zeros_like(div)
        a = cg_pressure(p0, div, num_iters=20)
        b = cg_pressure_pallas(p0, div, num_iters=20)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_step3d_use_pallas_matches(self):
        from smokephysai_tpu.physics.solver3d import (
            add_smoke_source3d, init_state3d, step3d,
        )

        s = init_state3d((8, 8, 128))
        s = s.replace(
            density=add_smoke_source3d(s.density, 64.0, 4.0, 4.0, 3.0, 1.0)
        )
        s = step3d(s, num_cg_iters=10)  # build up velocity
        a = step3d(s, num_cg_iters=10, use_pallas=False)
        b = step3d(s, num_cg_iters=10, use_pallas=True)
        np.testing.assert_allclose(
            np.asarray(a.density), np.asarray(b.density), atol=1e-6
        )

    def test_fits_guard(self):
        from smokephysai_tpu.ops.pallas.cg3d import fits_cg3d

        assert fits_cg3d((128, 128, 128))
        assert not fits_cg3d((512, 512, 512))
        assert not fits_cg3d((16, 16, 100))  # lane-misaligned last axis
