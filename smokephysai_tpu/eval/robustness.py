"""Robustness evaluation: physics-consistency MAE + reconstruction quality.

Re-design of reference src/evaluation/robustness_metrics.py:9-103 against a
jitted predict function (instead of a torch module). Metric definitions are
identical (simplified avg-pool SSIM window 11, PSNR on [0,1], MSE).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax.numpy as jnp

from smokephysai_tpu.train import metrics as M

Array = jnp.ndarray
Predictor = Callable[[Array], Dict[str, Array]]


class RobustnessEvaluator:
    """Reference robustness_metrics.py:9; `predict` is a
    serving.make_predictor-style function over NHWC batches."""

    def evaluate_physics_consistency(
        self, predict: Predictor, test_data: Array, physics_targets: Dict
    ) -> Dict[str, float]:
        """Per-feature MAE of predicted chaos features
        (reference robustness_metrics.py:15-48)."""
        pred = predict(test_data)["physics_features"]
        out = {}
        names = [
            ("lyapunov", 0, "lyapunov_mae"),
            ("fractal_dimension", 1, "fractal_mae"),
            ("entropy", 2, "entropy_mae"),
        ]
        for key, col, metric_name in names:
            if key in physics_targets:
                target = jnp.asarray(physics_targets[key])
                out[metric_name] = float(
                    jnp.mean(jnp.abs(pred[:, col] - target))
                )
        return out

    def evaluate_reconstruction_quality(
        self, predict: Predictor, test_data: Array, targets: Array
    ) -> Dict[str, float]:
        """SSIM / PSNR / MSE (reference robustness_metrics.py:50-103).

        Volumetric inputs ([N, D, H, W, 1]) use slicewise SSIM — the window
        runs over each z slice and the score averages across slices (3D
        protocol defined in PARITY.md; the reference metric is 2D-only)."""
        recon = predict(test_data)["reconstructed"]
        if recon.ndim == 5:
            n, d, h, w, c = recon.shape
            recon_s = recon.reshape(n * d, h, w, c)
            targets_s = jnp.asarray(targets).reshape(n * d, h, w, c)
        else:
            recon_s, targets_s = recon, targets
        return {
            "ssim": float(M.ssim(recon_s, targets_s)),
            "psnr": float(M.psnr(recon, targets)),
            "mse": float(M.mse(recon, targets)),
        }
