"""Pallas kernel correctness vs the XLA reference path (interpret mode on
CPU, compiled Mosaic on TPU — SURVEY.md §7 layer 1b)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


def test_flash_trainable_gradients_match_einsum():
    """flash_attention_tokens_trainable's Pallas VJP (the training path's
    attention) == jax.grad through the einsum reference, all three inputs."""
    from smokephysai_tpu.ops.pallas.attention import (
        flash_attention_tokens_trainable,
    )

    B, L, D, H = 2, 256, 128, 8
    hd = D // H
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(7), 4)
    q = jax.random.normal(k1, (B, L, D))
    k = jax.random.normal(k2, (B, L, D))
    v = jax.random.normal(k3, (B, L, D))
    g = jax.random.normal(k4, (B, L, D))

    def ref(q, k, v):
        split = lambda t: t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhid,bhjd->bhij", split(q), split(k)) / np.sqrt(hd)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", a, split(v))
        return o.transpose(0, 2, 1, 3).reshape(B, L, D)

    out = flash_attention_tokens_trainable(q, k, v, H, 1.0)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref(q, k, v)), atol=2e-5
    )
    gf = jax.grad(
        lambda q, k, v: jnp.sum(flash_attention_tokens_trainable(q, k, v, H, 1.0) * g),
        argnums=(0, 1, 2),
    )(q, k, v)
    gr = jax.grad(
        lambda q, k, v: jnp.sum(ref(q, k, v) * g), argnums=(0, 1, 2)
    )(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_flash_bwd_fused_matches_split(monkeypatch):
    """The fused dq+dk+dv backward kernel (default) and the split dq/dkv
    kernels (SMOKEPHYS_FUSED_BWD=0 escape hatch) produce the same
    gradients — the fused path accumulates dk/dv in f32 across q-block
    grid iterations instead of reducing inside one kernel invocation."""
    from smokephysai_tpu.ops.pallas.attention import (
        flash_attention_tokens_trainable,
    )

    B, L, D, H = 2, 256, 128, 8
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(11), 4)
    q = jax.random.normal(k1, (B, L, D))
    k = jax.random.normal(k2, (B, L, D))
    v = jax.random.normal(k3, (B, L, D))
    g = jax.random.normal(k4, (B, L, D))

    def grads():
        return jax.grad(
            lambda q, k, v: jnp.sum(
                flash_attention_tokens_trainable(q, k, v, H, 1.0, block_q=64) * g
            ),
            argnums=(0, 1, 2),
        )(q, k, v)

    monkeypatch.setenv("SMOKEPHYS_FUSED_BWD", "1")
    fused = grads()
    monkeypatch.setenv("SMOKEPHYS_FUSED_BWD", "0")
    split = grads()
    for a, b in zip(fused, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)


def test_flash_trainable_temperature_gradients():
    from smokephysai_tpu.ops.pallas.attention import (
        flash_attention_tokens_trainable,
    )

    B, L, D, H = 1, 128, 64, 4
    hd = D // H
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(8), 3)
    q = jax.random.normal(k1, (B, L, D))
    k = jax.random.normal(k2, (B, L, D))
    v = jax.random.normal(k3, (B, L, D))

    def ref_loss(q, k, v):
        split = lambda t: t.reshape(B, L, H, hd).transpose(0, 2, 1, 3)
        s = jnp.einsum("bhid,bhjd->bhij", split(q), split(k)) / (
            np.sqrt(hd) * 1.5
        )
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bhij,bhjd->bhid", a, split(v))
        return jnp.sum(o ** 2)

    flash_loss = lambda q, k, v: jnp.sum(
        flash_attention_tokens_trainable(q, k, v, H, 1.5) ** 2
    )
    gf = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_train_step_bf16_flash_finite():
    """create_train_state honours tpu.train_compute_dtype/use_flash/
    fast_math; one train step produces finite loss and f32 params."""
    from smokephysai_tpu.train.loop import create_train_state, make_train_step
    from smokephysai_tpu.utils.config import load_config

    config = load_config()
    config["data"]["grid_size"] = [64, 64]
    config["model"]["input_dim"] = 64
    config["tpu"]["train_compute_dtype"] = "bfloat16"
    config["tpu"]["use_flash"] = True
    config["tpu"]["fast_math"] = True
    state = create_train_state(config, jax.random.PRNGKey(0))
    # master params stay f32 under mixed precision
    assert all(
        leaf.dtype == jnp.float32
        for leaf in jax.tree_util.tree_leaves(state.params)
    )
    tstep = make_train_step(config["physics"])
    key = jax.random.PRNGKey(1)
    b = {
        "input": jax.random.uniform(key, (2, 64, 64, 1)),
        "target": jax.random.uniform(key, (2, 64, 64, 1)),
        "chaos_features": jax.random.uniform(key, (2, 3)),
    }
    state, m = tstep(state, b, key)
    assert np.isfinite(float(m["total_loss"]))


def test_explicit_max_disp_honoured_on_fused_path():
    """An explicit max_disp is honoured VERBATIM by the fused kernel (the
    old plumbing silently coerced 2 -> 1, so the Pallas and XLA paths
    diverged exactly when the caller raised the bound to keep them equal).
    Velocities here displace ~1.5 cells/step: D=2 tent advection is exact,
    D=1 truncates nonzero taps."""
    s = init_state((64, 64))
    s = s.replace(
        u=jnp.full_like(s.u, 150.0),
        v=jnp.full_like(s.v, 150.0),
        density=add_smoke_source(s.density, 32.0, 32.0, radius=8.0,
                                 intensity=1.5),
    )
    ref = step(s, use_pallas=False, max_disp=2)
    got = step(s, use_pallas=True, max_disp=2)
    np.testing.assert_allclose(
        np.asarray(got.density), np.asarray(ref.density), atol=1e-5
    )
    # sensitivity check: the default fused policy (D=1) DOES diverge at
    # this displacement, so the equality above proves D=2 reached the kernel
    got_d1 = step(s, use_pallas=True)
    assert float(jnp.max(jnp.abs(got_d1.density - ref.density))) > 1e-4
