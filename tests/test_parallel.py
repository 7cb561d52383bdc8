"""Parallelism tests on the 8-virtual-device CPU mesh (SURVEY.md §4
'distributed tests without a cluster'): halo-exchange numerics vs the
single-device solver, TP/DP sharded training step, and the driver's
multichip dryrun."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.parallel.halo import sharded_diffuse, sharded_jacobi
from smokephysai_tpu.parallel.mesh import make_mesh
from smokephysai_tpu.parallel.sharding import (
    param_sharding_specs,
    shard_batch,
    shard_params,
)
from smokephysai_tpu.physics.solver import diffuse, jacobi_pressure

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


@pytest.fixture(scope="module")
def space_mesh():
    return make_mesh(space=8)


class TestHalo:
    def test_sharded_diffuse_matches_reference(self, space_mesh):
        f = jax.random.uniform(jax.random.PRNGKey(0), (64, 32))
        expected = diffuse(f, dt=0.01, viscosity=0.5)
        got = sharded_diffuse(f, 0.01, 0.5, space_mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)

    def test_sharded_jacobi_matches_reference(self, space_mesh):
        k1, k2 = jax.random.split(jax.random.PRNGKey(1))
        p0 = jax.random.normal(k1, (64, 32))
        div = jax.random.normal(k2, (64, 32))
        expected = jacobi_pressure(p0, div, num_iters=20)
        got = sharded_jacobi(p0, div, 20, space_mesh)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-5)

    def test_sharded_jacobi_zero_boundary(self, space_mesh):
        p0 = jnp.ones((64, 32))
        div = jnp.zeros((64, 32))
        out = np.asarray(sharded_jacobi(p0, div, 5, space_mesh))
        assert (out[0] == 0).all() and (out[-1] == 0).all()
        assert (out[:, 0] == 0).all() and (out[:, -1] == 0).all()


class TestShardedTraining:
    def test_param_specs_cover_tp_layers(self):
        from smokephysai_tpu.train.loop import create_train_state

        config = {
            "data": {"grid_size": [64, 64]},
            "model": {
                "input_dim": 32, "hidden_dim": 64, "num_layers": 1,
                "num_heads": 4, "output_channels": 16, "chaos_strength": 0.1,
            },
            "training": {
                "batch_size": 4, "num_epochs": 1,
                "learning_rate": 1e-3, "weight_decay": 0.01,
            },
        }
        state = create_train_state(config, jax.random.PRNGKey(0), 1)
        specs = param_sharding_specs(state.params)
        layer = specs["layer_0"]["chaos_attention"]
        assert layer["q_proj"]["kernel"] == jax.sharding.PartitionSpec(None, "model")
        assert layer["out_proj"]["kernel"] == jax.sharding.PartitionSpec("model", None)
        assert specs["feature_proj"]["kernel"] == jax.sharding.PartitionSpec()

    def test_dryrun_multichip_8(self):
        import __graft_entry__ as ge

        ge.dryrun_multichip(8)

    def test_dp_sharded_step_matches_single_device(self):
        """The DP+TP sharded train step must produce the same loss as the
        unsharded step (GSPMD only changes placement, not numerics)."""
        from smokephysai_tpu.train.loop import create_train_state, make_train_step

        config = {
            "data": {"grid_size": [64, 64]},
            "model": {
                "input_dim": 32, "hidden_dim": 64, "num_layers": 1,
                "num_heads": 4, "output_channels": 16, "chaos_strength": 0.1,
            },
            "physics": {
                "conservation_weight": 1.0, "continuity_weight": 1.0,
                "energy_weight": 0.5,
            },
            "training": {
                "batch_size": 8, "num_epochs": 1,
                "learning_rate": 1e-3, "weight_decay": 0.01,
            },
        }
        state = create_train_state(config, jax.random.PRNGKey(0), 1)
        key = jax.random.PRNGKey(5)
        batch = {
            "input": jax.random.uniform(key, (8, 64, 64, 1)),
            "target": jax.random.uniform(key, (8, 64, 64, 1)),
            "chaos_features": jax.random.uniform(key, (8, 3)),
            "sequence": jax.random.uniform(key, (8, 20, 64, 64)),
        }
        tstep = make_train_step(config["physics"])
        # the train step donates its input state buffers, so build a fully
        # independent state for the sharded run (same key -> identical init)
        state2 = create_train_state(config, jax.random.PRNGKey(0), 1)
        mesh = make_mesh(data=4, model=2)
        state_sharded = state2.replace(params=shard_params(state2.params, mesh))
        batch_sharded = shard_batch(batch, mesh)
        _, m_single = tstep(state, batch, jax.random.PRNGKey(9))
        _, m_sharded = tstep(state_sharded, batch_sharded, jax.random.PRNGKey(9))
        np.testing.assert_allclose(
            float(m_single["total_loss"]),
            float(m_sharded["total_loss"]),
            rtol=2e-4,
        )


class TestRingAttention:
    def test_matches_full_attention(self, space_mesh):
        from smokephysai_tpu.parallel.ring_attention import ring_attention

        B, H, L, D = 2, 4, 64, 16
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        q = jax.random.normal(ks[0], (B, H, L, D))
        k = jax.random.normal(ks[1], (B, H, L, D))
        v = jax.random.normal(ks[2], (B, H, L, D))

        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(D)
        expected = jnp.einsum(
            "bhij,bhjd->bhid", jax.nn.softmax(scores, axis=-1), v
        )
        got = ring_attention(q, k, v, space_mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-5
        )

    def test_temperature(self, space_mesh):
        from smokephysai_tpu.parallel.ring_attention import ring_attention

        B, H, L, D = 1, 2, 32, 8
        ks = jax.random.split(jax.random.PRNGKey(4), 3)
        q, k, v = (jax.random.normal(kk, (B, H, L, D)) for kk in ks)
        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / (np.sqrt(D) * 2.0)
        expected = jnp.einsum(
            "bhij,bhjd->bhid", jax.nn.softmax(scores, axis=-1), v
        )
        got = ring_attention(q, k, v, space_mesh, temperature=2.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-5
        )


class TestUlyssesAttention:
    """Head-scatter all-to-all sequence parallelism
    (parallel/ulysses_attention.py) — must equal full attention."""

    def test_matches_full_attention(self, space_mesh):
        from smokephysai_tpu.parallel.ulysses_attention import ulysses_attention

        B, H, L, D = 2, 8, 64, 16  # H == axis size (1 head per device)
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        q, k, v = (jax.random.normal(kk, (B, H, L, D)) for kk in ks)
        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / np.sqrt(D)
        expected = jnp.einsum(
            "bhij,bhjd->bhid", jax.nn.softmax(scores, axis=-1), v
        )
        got = ulysses_attention(q, k, v, space_mesh)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-5
        )

    def test_multiple_heads_per_device(self):
        from smokephysai_tpu.parallel.mesh import make_mesh
        from smokephysai_tpu.parallel.ulysses_attention import ulysses_attention

        mesh = make_mesh(space=4)
        B, H, L, D = 1, 8, 32, 8  # 2 heads per device
        ks = jax.random.split(jax.random.PRNGKey(6), 3)
        q, k, v = (jax.random.normal(kk, (B, H, L, D)) for kk in ks)
        scores = jnp.einsum("bhid,bhjd->bhij", q, k) / (np.sqrt(D) * 2.0)
        expected = jnp.einsum(
            "bhij,bhjd->bhid", jax.nn.softmax(scores, axis=-1), v
        )
        got = ulysses_attention(q, k, v, mesh, temperature=2.0)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=2e-5
        )


class TestPipeline:
    def test_pipeline_matches_sequential(self):
        """4 dense stages over a 4-device pipeline must equal sequential
        application (GPipe schedule correctness)."""
        from smokephysai_tpu.parallel.pipeline import pipeline_apply

        mesh = make_mesh(model=4)
        S, D = 4, 16
        ks = jax.random.split(jax.random.PRNGKey(0), 2)
        stacked = {
            "w": jax.random.normal(ks[0], (S, D, D)) / np.sqrt(D),
            "b": jax.random.normal(ks[1], (S, D)) * 0.1,
        }
        x = jax.random.normal(jax.random.PRNGKey(1), (8, D))

        def stage_fn(p, a):
            return jnp.tanh(a @ p["w"] + p["b"])

        expected = x
        for i in range(S):
            expected = jnp.tanh(
                expected @ stacked["w"][i] + stacked["b"][i]
            )

        got = pipeline_apply(stacked, x, stage_fn, mesh, num_microbatches=4)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=1e-5
        )

    def test_pipeline_dp_x_pp(self):
        """dp x pp composition (VERDICT r3 #7): each data-parallel row of a
        data=2 x model=4 mesh runs its own pipeline; the ppermute ring stays
        within a row. Result must equal the sequential stack."""
        from smokephysai_tpu.parallel.pipeline import pipeline_apply

        mesh = make_mesh(data=2, model=4)
        S, D = 4, 16
        ks = jax.random.split(jax.random.PRNGKey(3), 2)
        stacked = {
            "w": jax.random.normal(ks[0], (S, D, D)) / np.sqrt(D),
            "b": jax.random.normal(ks[1], (S, D)) * 0.1,
        }
        x = jax.random.normal(jax.random.PRNGKey(4), (8, D))

        def stage_fn(p, a):
            return jnp.tanh(a @ p["w"] + p["b"])

        expected = x
        for i in range(S):
            expected = jnp.tanh(
                expected @ stacked["w"][i] + stacked["b"][i]
            )

        got = pipeline_apply(
            stacked, x, stage_fn, mesh, num_microbatches=4,
            axis_name="model", data_axis="data",
        )
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(expected), atol=1e-5
        )

    def test_pipeline_single_microbatch(self):
        from smokephysai_tpu.parallel.pipeline import pipeline_apply

        mesh = make_mesh(model=2)
        stacked = {"w": jnp.stack([jnp.eye(4) * 2.0, jnp.eye(4) * 3.0])}
        x = jnp.ones((2, 4))
        got = pipeline_apply(
            stacked, x, lambda p, a: a @ p["w"], mesh, num_microbatches=1
        )
        np.testing.assert_allclose(np.asarray(got), 6.0 * np.ones((2, 4)))


class TestShardedSolverStep:
    def test_overlapped_layout_roundtrip(self):
        from smokephysai_tpu.parallel.sharded_solver import (
            from_overlapped, to_overlapped,
        )

        u = jax.random.normal(jax.random.PRNGKey(0), (65, 32))
        ov = to_overlapped(u, 8)
        assert ov.shape == (8 * 9, 32)
        np.testing.assert_array_equal(
            np.asarray(from_overlapped(ov, 8)), np.asarray(u)
        )

    def test_full_step_matches_single_device(self, space_mesh):
        """Complete domain-decomposed step == solver.step, element-wise."""
        from smokephysai_tpu.parallel.sharded_solver import sharded_step
        from smokephysai_tpu.physics import add_smoke_source, init_state
        from smokephysai_tpu.physics.solver import step

        s = init_state((64, 32))
        d = add_smoke_source(s.density, 16.0, 20.0, radius=6.0, intensity=1.5)
        k1, k2 = jax.random.split(jax.random.PRNGKey(2))
        s = s.replace(
            density=d,
            u=0.5 * jax.random.normal(k1, (65, 32)),
            v=0.5 * jax.random.normal(k2, (64, 33)),
        )

        s_ref = s
        s_shard = s
        for _ in range(3):
            s_ref = step(s_ref, dt=0.01, viscosity=0.001)
            s_shard = sharded_step(s_shard, space_mesh, dt=0.01,
                                   viscosity=0.001)
        np.testing.assert_allclose(
            np.asarray(s_shard.density), np.asarray(s_ref.density), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_shard.u), np.asarray(s_ref.u), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_shard.v), np.asarray(s_ref.v), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(s_shard.p), np.asarray(s_ref.p), atol=1e-5
        )

    def test_sharded_multi_step_bit_exact(self, space_mesh):
        from smokephysai_tpu.parallel.sharded_solver import sharded_multi_step
        from smokephysai_tpu.physics import add_smoke_source, init_state
        from smokephysai_tpu.physics.solver import multi_step

        s = init_state((64, 32))
        s = s.replace(
            density=add_smoke_source(s.density, 16.0, 20.0, 6.0, 1.5)
        )
        _, t_sharded = sharded_multi_step(s, space_mesh, 4)
        _, t_ref = multi_step(s, 4)
        np.testing.assert_allclose(
            np.asarray(t_sharded), np.asarray(t_ref), atol=1e-6
        )

    def test_facade_with_mesh_matches_single_device(self, space_mesh):
        # square grid: the fractal perturbation keeps the reference's
        # transposed orientation and (like the reference) only supports
        # square grids (fractal.py docstring)
        from smokephysai_tpu.physics.simulator import SmokeSimulator

        sim_a = SmokeSimulator(grid_size=(64, 64))
        sim_b = SmokeSimulator(grid_size=(64, 64), mesh=space_mesh)
        for sim in (sim_a, sim_b):
            sim.add_incense_source([(16, 20)], [1.5])
        for _ in range(2):
            fa = sim_a.simulate_step()
            fb = sim_b.simulate_step()
        np.testing.assert_allclose(
            np.asarray(fb), np.asarray(fa), atol=1e-6
        )


class TestPipelineRealTrunk:
    """VERDICT r1 item 7: pipeline parallelism on the REAL chaos trunk —
    stacked ChaosTransformerLayer params through pipeline_apply, equality vs
    the sequential trunk, plus the full pipelined predictor."""

    def _model_and_vars(self):
        from smokephysai_tpu.models import SmokePhysNet

        model = SmokePhysNet(
            input_dim=32, hidden_dim=64, num_layers=6, num_heads=4,
            output_channels=16,
        )
        x = jax.random.uniform(jax.random.PRNGKey(0), (4, 64, 64, 1))
        variables = model.init(
            {"params": jax.random.PRNGKey(1), "chaos": jax.random.PRNGKey(2)},
            x, train=False,
        )
        return model, variables, x

    @pytest.mark.parametrize("num_stages", [2, 4])
    def test_pipelined_trunk_equals_sequential(self, num_stages):
        """num_stages=4 is the UNEVEN case (VERDICT r3 #7): 6 layers
        front-loaded as [2, 2, 1, 1] with padded slots masked out."""
        from smokephysai_tpu.models.net import ChaosTransformerLayer
        from smokephysai_tpu.parallel.mesh import make_mesh
        from smokephysai_tpu.parallel.pipeline import (
            pipeline_apply, stack_layer_params,
        )

        model, variables, x = self._model_and_vars()
        mesh = make_mesh(model=num_stages)
        feats = model.apply(variables, x, False, method="encode")

        lps_max = -(-6 // num_stages)
        stacked = stack_layer_params(variables["params"], 6, num_stages)
        layer_module = ChaosTransformerLayer(64, 4, 0.1)
        base_key = jax.random.PRNGKey(7)

        def stage_fn(stage_params, h):
            p_stage, layer_idx, valid = stage_params
            for j in range(lps_max):
                p_j = jax.tree_util.tree_map(lambda t: t[j], p_stage)
                k_j = jax.random.fold_in(base_key, layer_idx[j])
                y = layer_module.apply({"params": p_j}, h, True, k_j)
                h = jnp.where(valid[j], y, h)
            return h

        M = 2  # microbatches
        out_pipe = pipeline_apply(stacked, feats, stage_fn, mesh, M, "model")

        # sequential comparator with identical per-(layer, microbatch) keys:
        # the pipeline draws the Lorenz init per microbatch, so apply the
        # layers per microbatch and concatenate
        mb = feats.shape[0] // M
        chunks = []
        for m in range(M):
            h = feats[m * mb : (m + 1) * mb]
            for i in range(6):
                p_i = variables["params"][f"layer_{i}"]
                k_i = jax.random.fold_in(base_key, i)
                h = layer_module.apply({"params": p_i}, h, True, k_i)
            chunks.append(h)
        out_seq = jnp.concatenate(chunks)

        np.testing.assert_allclose(
            np.asarray(out_pipe), np.asarray(out_seq), atol=1e-5
        )

    def test_pipelined_predictor_end_to_end(self):
        from smokephysai_tpu.parallel.mesh import make_mesh
        from smokephysai_tpu.train.serving import make_pipelined_predictor

        model, variables, x = self._model_and_vars()
        mesh = make_mesh(model=6)  # one layer per stage
        predict = make_pipelined_predictor(model, variables, mesh)
        out = predict(x)
        assert out["reconstructed"].shape == (4, 64, 64, 1)
        assert out["physics_features"].shape == (4, 3)
        assert np.isfinite(np.asarray(out["reconstructed"])).all()
        # deterministic across calls (fixed chaos seed)
        out2 = predict(x)
        np.testing.assert_array_equal(
            np.asarray(out["reconstructed"]), np.asarray(out2["reconstructed"])
        )


class TestShardedSolver3D:
    """parallel/sharded_solver3d.py: the full domain-decomposed 3D step
    (z-slab sharding, overlapped w layout, distributed CG) vs the
    single-device solver3d.step3d. Tolerances allow the CG dots' psum
    reduction-order difference (~1 f32 ULP per dot per iteration)."""

    def _dev_state(self, d=32, h=16, w=16, seed=3):
        from smokephysai_tpu.physics.solver3d import (
            add_smoke_source3d, init_state3d,
        )

        s = init_state3d((d, h, w))
        s = s.replace(
            density=add_smoke_source3d(
                s.density, w / 2, h / 2, d / 2, radius=5.0, intensity=1.5
            )
        )
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
        return s.replace(
            u=0.3 * jax.random.normal(k1, (d, h, w + 1)),
            v=0.3 * jax.random.normal(k2, (d, h + 1, w)),
            w=0.3 * jax.random.normal(k3, (d + 1, h, w)),
        )

    def test_overlapped_roundtrip(self):
        from smokephysai_tpu.parallel.sharded_solver3d import (
            from_overlapped3d, to_overlapped3d,
        )

        w = jax.random.normal(jax.random.PRNGKey(0), (33, 8, 8))
        back = from_overlapped3d(to_overlapped3d(w, 8), 8)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(w))

    def test_sharded_step3d_matches_reference(self, space_mesh):
        from smokephysai_tpu.parallel.sharded_solver3d import sharded_step3d
        from smokephysai_tpu.physics.solver3d import step3d

        s_ref = s_shard = self._dev_state()
        for _ in range(3):
            s_ref = step3d(s_ref, dt=0.01, viscosity=0.001, num_cg_iters=10)
            s_shard = sharded_step3d(
                s_shard, space_mesh, dt=0.01, viscosity=0.001,
                num_cg_iters=10,
            )
        for f in ("density", "u", "v", "w", "p"):
            # rtol term: p is O(5) and the CG dots' psum reduction-order
            # drift compounds over the 3 steps (~1 ULP/dot/iteration)
            np.testing.assert_allclose(
                np.asarray(getattr(s_shard, f)),
                np.asarray(getattr(s_ref, f)),
                atol=2e-5,
                rtol=1e-4,
                err_msg=f,
            )

    def test_sharded_multi_step3d_matches_reference(self, space_mesh):
        from smokephysai_tpu.parallel.sharded_solver3d import (
            sharded_multi_step3d,
        )
        from smokephysai_tpu.physics.solver3d import multi_step3d

        s = self._dev_state(seed=4)
        _, t_sharded = sharded_multi_step3d(
            s, space_mesh, 3, num_cg_iters=8
        )
        _, t_ref = multi_step3d(s, 3, num_cg_iters=8)
        np.testing.assert_allclose(
            np.asarray(t_sharded), np.asarray(t_ref), atol=2e-5
        )

    def test_sharded_step3d_gather_path(self, space_mesh):
        """max_disp taps > 1 still agree (wider halos)."""
        from smokephysai_tpu.parallel.sharded_solver3d import sharded_step3d
        from smokephysai_tpu.physics.solver3d import step3d

        s = self._dev_state(d=16, h=8, w=8, seed=5)
        ref = step3d(s, num_cg_iters=6, max_disp=2)
        got = sharded_step3d(s, space_mesh, num_cg_iters=6, max_disp=2)
        np.testing.assert_allclose(
            np.asarray(got.density), np.asarray(ref.density), atol=2e-5
        )
