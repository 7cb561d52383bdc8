"""Evaluation-layer tests (reference src/evaluation/; SURVEY.md §2.4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.eval import PerturbationTester, RobustnessEvaluator
from smokephysai_tpu.train.serving import build_model, make_predictor

CONFIG = {
    "model": {
        "input_dim": 32,
        "hidden_dim": 64,
        "num_layers": 1,
        "num_heads": 4,
        "output_channels": 16,
        "chaos_strength": 0.1,
    }
}


@pytest.fixture(scope="module")
def predictor():
    model = build_model(CONFIG)
    x = jnp.zeros((1, 64, 64, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return make_predictor(model, variables)


@pytest.fixture(scope="module")
def test_batch():
    return jax.random.uniform(jax.random.PRNGKey(2), (4, 64, 64, 1))


class TestRobustness:
    def test_physics_consistency(self, predictor, test_batch):
        ev = RobustnessEvaluator()
        out = ev.evaluate_physics_consistency(
            predictor,
            test_batch,
            {
                "lyapunov": np.zeros(4, np.float32),
                "fractal_dimension": np.ones(4, np.float32),
                "entropy": np.full(4, 0.5, np.float32),
            },
        )
        assert set(out) == {"lyapunov_mae", "fractal_mae", "entropy_mae"}
        assert all(np.isfinite(v) and v >= 0 for v in out.values())

    def test_reconstruction_quality(self, predictor, test_batch):
        ev = RobustnessEvaluator()
        out = ev.evaluate_reconstruction_quality(
            predictor, test_batch, test_batch
        )
        assert set(out) == {"ssim", "psnr", "mse"}
        assert -1.0 <= out["ssim"] <= 1.0
        assert out["mse"] >= 0


class TestPerturbation:
    def test_gaussian_noise_levels(self, predictor, test_batch):
        pt = PerturbationTester()
        out = pt.gaussian_noise_test(
            predictor, test_batch, noise_levels=[0.01, 0.2],
            key=jax.random.PRNGKey(3),
        )
        assert set(out) == {"gaussian_0.01", "gaussian_0.2"}
        for r in out.values():
            assert -1.0 <= r["feature_stability"] <= 1.0 + 1e-6
            assert r["reconstruction_mse"] >= 0
        # more noise => no more stable than less noise (weak monotonicity)
        assert (
            out["gaussian_0.2"]["reconstruction_mse"]
            >= out["gaussian_0.01"]["reconstruction_mse"]
        )

    def test_adversarial(self, predictor, test_batch):
        pt = PerturbationTester()
        out = pt.adversarial_test(
            predictor, test_batch, epsilon=0.05, num_steps=2
        )
        assert np.isfinite(out["adversarial_feature_stability"])
        assert out["adversarial_perturbation_norm"] > 0
        # delta is epsilon-bounded: ||delta||_2 <= eps * sqrt(numel)
        max_norm = 0.05 * np.sqrt(np.prod(test_batch.shape))
        assert out["adversarial_perturbation_norm"] <= max_norm + 1e-4

    def test_physics_perturbation(self, predictor):
        pt = PerturbationTester()
        out = pt.physics_perturbation_test(
            predictor, grid_size=(64, 64), num_tests=3, num_steps=12,
            key=jax.random.PRNGKey(4),
        )
        assert 0.0 < out["physics_prediction_stability"] <= 1.0
        assert out["num_tests"] == 3


class TestChunkedPredictor:
    """make_chunked_predictor: the volumetric protocol's HBM-safety wrapper.

    Exact-equality checks use chaos_strength=0: with chaos ON, the fixed
    chaos key draws a [B, ...] field whose per-sample values depend on the
    batch SHAPE, so chunked evaluation is a different (equally valid,
    still deterministic) draw than one full-batch call — samples never
    couple through each other's DATA, which is what chunking relies on."""

    @pytest.fixture(scope="class")
    def predictor_nochaos(self):
        cfg = {"model": {**CONFIG["model"], "chaos_strength": 0.0}}
        model = build_model(cfg)
        x = jnp.zeros((1, 64, 64, 1))
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
            x, train=False,
        )
        return make_predictor(model, variables)

    def test_matches_full_batch(self, predictor_nochaos, test_batch):
        from smokephysai_tpu.train.serving import make_chunked_predictor

        full = predictor_nochaos(test_batch)
        for chunk in (1, 3, 4, 7):  # incl. padded tail and chunk >= batch
            chunked = make_chunked_predictor(predictor_nochaos, chunk)(
                test_batch
            )
            assert set(chunked) == set(full)
            for k in full:
                # tight allclose, not bit-equality: XLA tiles convs and
                # reductions differently per batch shape (~1e-8 drift)
                np.testing.assert_allclose(
                    np.asarray(chunked[k]), np.asarray(full[k]),
                    atol=1e-6, rtol=1e-5,
                    err_msg=f"key={k} chunk={chunk}",
                )

    def test_adversarial_chunked_matches_full(
        self, predictor_nochaos, test_batch
    ):
        """Per-chunk PGD is exact (per-sample loss decomposition +
        sign-invariance to the 1/N mean scale)."""
        pt = PerturbationTester()
        full = pt.adversarial_test(
            predictor_nochaos, test_batch, epsilon=0.05, num_steps=2
        )
        chunked = pt.adversarial_test(
            predictor_nochaos, test_batch, epsilon=0.05, num_steps=2,
            chunk_size=3,
        )
        assert np.isclose(
            chunked["adversarial_perturbation_norm"],
            full["adversarial_perturbation_norm"],
            rtol=1e-3,
        )
        assert np.isclose(
            chunked["adversarial_feature_stability"],
            full["adversarial_feature_stability"],
            atol=1e-4,
        )

    def test_chunked_shapes_with_chaos(self, predictor, test_batch):
        """With chaos ON the wrapper still returns the full contract (the
        values are a different deterministic draw — see class docstring)."""
        from smokephysai_tpu.train.serving import make_chunked_predictor

        out = make_chunked_predictor(predictor, 3)(test_batch)
        full = predictor(test_batch)
        for k in full:
            assert out[k].shape == full[k].shape
            assert np.isfinite(np.asarray(out[k])).all()

    def test_gaussian_noise_through_chunked(self, predictor, test_batch):
        """gaussian_noise_test runs unchanged through the wrapper."""
        from smokephysai_tpu.train.serving import make_chunked_predictor

        pt = PerturbationTester()
        ref = pt.gaussian_noise_test(
            predictor, test_batch, noise_levels=[0.05],
            key=jax.random.PRNGKey(3),
        )
        got = pt.gaussian_noise_test(
            make_chunked_predictor(predictor, 2), test_batch,
            noise_levels=[0.05], key=jax.random.PRNGKey(3),
        )
        assert np.isclose(
            got["gaussian_0.05"]["feature_stability"],
            ref["gaussian_0.05"]["feature_stability"],
            rtol=1e-6,
        )
