"""Golden-parity tests for fractal fields and chaos features
(reference src/physics/fractal_generator.py, src/physics/smoke_simulator.py)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.physics import (
    apply_fractal_perturbation,
    chaos_features_from_sequence,
    fractal_dimension,
    lyapunov_exponent,
    mandelbrot_field,
    perlin_noise,
    shannon_entropy,
)
from smokephysai_tpu.physics.simulator import SmokeSimulator, simulate_episode

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def fractal_golden():
    return np.load(os.path.join(GOLDENS, "fractal_64.npz"))


@pytest.fixture(scope="module")
def chaos_golden():
    return np.load(os.path.join(GOLDENS, "chaos_64.npz"))


class TestFractal:
    def test_perlin_matches_reference(self, fractal_golden):
        out = perlin_noise((64, 64), scale=10.0)
        np.testing.assert_allclose(
            np.asarray(out), fractal_golden["perlin"], atol=1e-5
        )

    def test_mandelbrot_matches_reference(self, fractal_golden):
        out = np.asarray(mandelbrot_field((64, 64), iterations=100))
        ref = fractal_golden["mandelbrot"]
        diff = np.abs(out - ref)
        # |z| <= 2 sits on a float knife-edge for boundary pixels; torch and
        # XLA complex arithmetic may flip the escape step by one iteration
        # (0.01 in normalised units) for a handful of cells.
        assert diff.max() <= 0.0101
        assert (diff > 1e-6).mean() < 0.005  # >99.5% bit-for-bit

    def test_perturbation_matches_reference(self, fractal_golden):
        # semantics check against the reference's own fractal field: the
        # perturbation is field * (1 + i * (0.7*perlin + 0.3*mandelbrot))
        F = 0.7 * fractal_golden["perlin"] + 0.3 * fractal_golden["mandelbrot"]
        out = apply_fractal_perturbation(
            jnp.asarray(fractal_golden["field"]),
            intensity=0.05,
            fractal=jnp.asarray(F),
        )
        np.testing.assert_allclose(
            np.asarray(out), fractal_golden["perturbed"], atol=1e-6
        )
        # end-to-end with our own fields: loose tol for the couple of
        # mandelbrot knife-edge pixels (see test above)
        out2 = apply_fractal_perturbation(
            jnp.asarray(fractal_golden["field"]), intensity=0.05
        )
        np.testing.assert_allclose(
            np.asarray(out2), fractal_golden["perturbed"], atol=5e-4
        )


class TestChaosFeatures:
    def test_sequence_matches_reference(self, chaos_golden):
        sim = SmokeSimulator(grid_size=(64, 64), dt=0.01, viscosity=0.001)
        sim.add_incense_source([(32, 20), (45, 40)], [1.5, 0.8])
        seq = [np.asarray(sim.simulate_step()) for _ in range(20)]
        np.testing.assert_allclose(
            np.stack(seq), chaos_golden["sequence"], atol=5e-5, rtol=1e-3
        )

    def test_per_frame_features_match_reference(self, chaos_golden):
        seq = jnp.asarray(chaos_golden["sequence"])
        golden = chaos_golden["per_step_features"]  # rows t=10..19
        for row, t in enumerate(range(10, 20)):
            fd = float(fractal_dimension(seq[t]))
            ent = float(shannon_entropy(seq[t]))
            lyap = (
                float(lyapunov_exponent(seq[t - 19 : t + 1])) if t >= 19 else 0.0
            )
            np.testing.assert_allclose(
                [lyap, fd, ent], golden[row], atol=1e-4, rtol=1e-3
            )

    def test_episode_average_matches_reference(self, chaos_golden):
        seq = jnp.asarray(chaos_golden["sequence"])
        avg = chaos_features_from_sequence(seq)
        np.testing.assert_allclose(
            np.asarray(avg), chaos_golden["avg_features"], atol=1e-4, rtol=1e-3
        )

    def test_facade_features_match_sequence_path(self, chaos_golden):
        sim = SmokeSimulator(grid_size=(64, 64))
        sim.add_incense_source([(32, 20), (45, 40)], [1.5, 0.8])
        for _ in range(20):
            sim.simulate_step()
        feats = sim.get_chaos_features()
        golden = chaos_golden["per_step_features"][-1]
        np.testing.assert_allclose(
            [
                feats["lyapunov_exponent"],
                feats["fractal_dimension"],
                feats["entropy"],
            ],
            golden,
            atol=1e-4,
            rtol=1e-3,
        )


class TestSimulateEpisode:
    def test_fused_episode_matches_facade(self, chaos_golden):
        xy = jnp.array([[32.0, 20.0], [45.0, 40.0], [0.0, 0.0]])
        inten = jnp.array([1.5, 0.8, 0.0])
        active = jnp.array([1.0, 1.0, 0.0])
        seq, label = simulate_episode(
            xy, inten, active, grid_size=(64, 64), num_steps=20
        )
        np.testing.assert_allclose(
            np.asarray(seq), chaos_golden["sequence"], atol=5e-5, rtol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(label), chaos_golden["avg_features"], atol=1e-4, rtol=1e-3
        )
