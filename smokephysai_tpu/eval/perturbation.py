"""Perturbation testing: Gaussian noise, PGD adversarial, physics-scenario
stability.

Re-design of reference src/evaluation/perturbation_tests.py:8-143. The PGD
attack uses `jax.grad` on the input directly (vs the reference's manual
delta bookkeeping). Reference quirk reproduced faithfully: the attack steps
along sign(d(-mse)/d(delta)) — i.e. it *descends* the reconstruction error
despite the 'maximize' comment (perturbation_tests.py:71-76); documented
here rather than silently fixed.

The physics perturbation test vmaps all `num_tests` random scenarios into
one simulation program instead of a Python loop over 50 scenarios
(perturbation_tests.py:104-120).
"""
from __future__ import annotations

from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp

from smokephysai_tpu.data.synthetic import sample_source_params
from smokephysai_tpu.physics.simulator import simulate_episode

Array = jnp.ndarray
Predictor = Callable[[Array], Dict[str, Array]]


def _cosine_sim(a: Array, b: Array) -> Array:
    num = jnp.sum(a * b, axis=1)
    den = jnp.linalg.norm(a, axis=1) * jnp.linalg.norm(b, axis=1) + 1e-12
    return num / den


class PerturbationTester:
    """Reference perturbation_tests.py:8; operates on a jitted predictor."""

    def gaussian_noise_test(
        self,
        predict: Predictor,
        test_data: Array,
        noise_levels: Sequence[float] = (0.01, 0.05, 0.1, 0.2),
        key: Array | None = None,
    ) -> Dict:
        """Latent-feature cosine stability + recon MSE vs the clean
        baseline at each noise level (reference perturbation_tests.py:14-50)."""
        key = key if key is not None else jax.random.PRNGKey(0)
        baseline = predict(test_data)
        results = {}
        for i, level in enumerate(noise_levels):
            noise = level * jax.random.normal(
                jax.random.fold_in(key, i), test_data.shape
            )
            noisy = jnp.clip(test_data + noise, 0.0, 1.0)
            pred = predict(noisy)
            results[f"gaussian_{level}"] = {
                "feature_stability": float(
                    jnp.mean(
                        _cosine_sim(
                            baseline["latent_features"], pred["latent_features"]
                        )
                    )
                ),
                "reconstruction_mse": float(
                    jnp.mean(
                        (pred["reconstructed"] - baseline["reconstructed"]) ** 2
                    )
                ),
            }
        return results

    def adversarial_test(
        self,
        predict: Predictor,
        test_data: Array,
        epsilon: float = 0.1,
        num_steps: int = 10,
        chunk_size: int | None = None,
    ) -> Dict:
        """PGD on the input via jax.grad
        (reference perturbation_tests.py:52-94, incl. its sign-direction
        quirk — see module docstring).

        `chunk_size` runs the attack per chunk of samples — needed for the
        volumetric protocol, where grad through one 50x128^3 forward
        exceeds HBM. Per-chunk PGD is exact, not an approximation: the loss
        is a per-sample mean (samples never couple through each other's
        data) and sign(grad) is invariant to the 1/N scale, so each
        sample's delta trajectory matches the full-batch attack's — up to
        the chaos draw, which is keyed on the batch shape (bit-identical
        when chaos_strength=0; see serving.make_chunked_predictor).
        Stability is re-weighted by chunk size; the global perturbation
        norm is the root-sum-square of chunk norms."""
        if chunk_size is not None and chunk_size < test_data.shape[0]:
            n = test_data.shape[0]
            stab_sum, sq_norm = 0.0, 0.0
            for s in range(0, n, chunk_size):
                blk = test_data[s : s + chunk_size]
                r = self.adversarial_test(predict, blk, epsilon, num_steps)
                stab_sum += r["adversarial_feature_stability"] * blk.shape[0]
                sq_norm += r["adversarial_perturbation_norm"] ** 2
            return {
                "adversarial_feature_stability": stab_sum / n,
                "adversarial_perturbation_norm": float(sq_norm**0.5),
            }

        # When the predictor exposes its jitted core + params (see
        # serving.make_predictor), thread the params through the PGD trace
        # as an argument — differentiating through the closure-based
        # wrapper would embed them as ~111 MB of StableHLO literals.
        jitted = getattr(predict, "jitted", None)
        if jitted is not None:
            variables = predict.variables

            def recon_neg_mse_v(delta, variables):
                adv = jnp.clip(test_data + delta, 0.0, 1.0)
                out = jitted(variables, adv)
                return -jnp.mean((out["reconstructed"] - test_data) ** 2)

            _grad_v = jax.jit(jax.grad(recon_neg_mse_v))
            grad_fn = lambda d: _grad_v(d, variables)
        else:

            def recon_neg_mse(delta):
                adv = jnp.clip(test_data + delta, 0.0, 1.0)
                out = predict(adv)
                return -jnp.mean((out["reconstructed"] - test_data) ** 2)

            grad_fn = jax.jit(jax.grad(recon_neg_mse))
        delta = jnp.zeros_like(test_data)
        for _ in range(num_steps):
            g = grad_fn(delta)
            delta = jnp.clip(
                delta + (epsilon / num_steps) * jnp.sign(g), -epsilon, epsilon
            )

        baseline = predict(test_data)
        adv_out = predict(jnp.clip(test_data + delta, 0.0, 1.0))
        return {
            "adversarial_feature_stability": float(
                jnp.mean(
                    _cosine_sim(
                        baseline["latent_features"], adv_out["latent_features"]
                    )
                )
            ),
            "adversarial_perturbation_norm": float(jnp.linalg.norm(delta)),
        }

    def physics_perturbation_test(
        self,
        predict: Predictor,
        grid_size=(128, 128),
        num_tests: int = 50,
        num_steps: int = 20,
        key: Array | None = None,
        dt: float = 0.01,
        viscosity: float = 0.001,
    ) -> Dict:
        """Stability = 1/(1+mean variance) of per-frame physics predictions
        over `num_tests` random scenarios
        (reference perturbation_tests.py:96-143), with all scenarios
        simulated in one vmapped program."""
        key = key if key is not None else jax.random.PRNGKey(0)
        if len(grid_size) == 3:
            feats = self._physics_scenarios3d(
                predict, tuple(grid_size), num_tests, num_steps, key, dt,
                viscosity,
            )
        else:
            params = sample_source_params(key, num_tests, grid_size)
            seqs, _ = jax.vmap(
                lambda xy, inten, act: simulate_episode(
                    xy, inten, act, grid_size=tuple(grid_size),
                    num_steps=num_steps, dt=dt, viscosity=viscosity,
                )
            )(params["xy"], params["intensity"], params["active"])
            # [N, T, H, W] -> predict physics features per frame
            N, T, H, W = seqs.shape
            frames = seqs.reshape(N * T, H, W, 1)
            feats = predict(frames)["physics_features"].reshape(N, T, 3)
        pred_var = jnp.mean(jnp.var(feats, axis=1), axis=-1)  # [N]
        avg_variance = float(jnp.mean(pred_var))
        return {
            "physics_prediction_stability": 1.0 / (1.0 + avg_variance),
            "num_tests": num_tests,
        }

    @staticmethod
    def _physics_scenarios3d(
        predict: Predictor, grid_size, num_tests, num_steps, key, dt,
        viscosity,
    ) -> Array:
        """Volumetric scenario features [N, T, 3] (3D protocol, PARITY.md):
        same stability definition, with simulation and prediction chunked —
        a 128^3 x T episode is ~100 MB of HBM, so neither the vmapped sim
        nor one [N*T, D, H, W, 1] predict batch fits at num_tests=50."""
        import numpy as np

        from smokephysai_tpu.data.synthetic3d import sample_source_params3d
        from smokephysai_tpu.physics.simulator3d import simulate_episode3d

        d, h, w = grid_size
        params = sample_source_params3d(key, num_tests, grid_size)
        sim = jax.jit(
            jax.vmap(
                lambda xyz, inten, act: simulate_episode3d(
                    xyz, inten, act, grid_size=grid_size,
                    num_steps=num_steps, dt=dt, viscosity=viscosity,
                )
            )
        )
        sim_chunk = max(1, (8 * 64**3) // (d * h * w))
        feat_chunks = []
        for start in range(0, num_tests, sim_chunk):
            end = min(start + sim_chunk, num_tests)
            seqs, _ = sim(
                params["xyz"][start:end],
                params["intensity"][start:end],
                params["active"][start:end],
            )  # [n, T, D, H, W]
            n, T = seqs.shape[:2]
            frames = seqs.reshape(n * T, d, h, w, 1)
            # predict in fixed-size volume chunks (static predict shapes)
            pc = max(1, min(n * T, (4 * 64**3) // (d * h * w) + 1))
            fs = []
            for fstart in range(0, n * T, pc):
                blk = frames[fstart : fstart + pc]
                if blk.shape[0] < pc:  # pad tail to the jitted shape
                    pad = pc - blk.shape[0]
                    blk = jnp.concatenate([blk, blk[-1:].repeat(pad, 0)], 0)
                    fs.append(
                        np.asarray(predict(blk)["physics_features"])[:-pad]
                    )
                else:
                    fs.append(np.asarray(predict(blk)["physics_features"]))
            feat_chunks.append(np.concatenate(fs).reshape(n, T, 3))
        return jnp.asarray(np.concatenate(feat_chunks))
