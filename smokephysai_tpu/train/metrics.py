"""Evaluation metrics matching the reference's definitions:
simplified avg-pool SSIM (reference src/evaluation/robustness_metrics.py:76-97),
PSNR (:99-103), MSE, and per-sample Pearson correlation of the 3 physics
features (reference benchmark.py:142-147)."""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def _avg_pool_same(x: Array, window: int) -> Array:
    """Mean filter with SAME padding over NHWC (torch F.avg_pool2d with
    stride 1, padding window//2 — count includes zero padding, matching
    torch's default count_include_pad=True)."""
    ones = jnp.ones((), x.dtype)
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        (1, window, window, 1),
        (1, 1, 1, 1),
        [(0, 0), (window // 2, window // 2), (window // 2, window // 2), (0, 0)],
    )
    return summed / (window * window)


def ssim(pred: Array, target: Array, window: int = 11) -> Array:
    """Simplified SSIM with uniform window (reference
    robustness_metrics.py:76-97; C1=0.01^2, C2=0.03^2)."""
    mu1 = _avg_pool_same(pred, window)
    mu2 = _avg_pool_same(target, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _avg_pool_same(pred * pred, window) - mu1_sq
    sigma2_sq = _avg_pool_same(target * target, window) - mu2_sq
    sigma12 = _avg_pool_same(pred * target, window) - mu1_mu2
    C1, C2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)


def psnr(pred: Array, target: Array) -> Array:
    """20*log10(1/sqrt(mse)) (reference robustness_metrics.py:99-103)."""
    mse = jnp.mean((pred - target) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def mse(pred: Array, target: Array) -> Array:
    return jnp.mean((pred - target) ** 2)


def pearson_per_sample(pred: Array, target: Array) -> Array:
    """Row-wise Pearson correlation over the feature axis
    (reference benchmark.py:142-147: scipy pearsonr per sample over the 3
    chaos features). pred/target: [B, F] -> [B]."""
    pm = pred - jnp.mean(pred, axis=-1, keepdims=True)
    tm = target - jnp.mean(target, axis=-1, keepdims=True)
    num = jnp.sum(pm * tm, axis=-1)
    den = jnp.sqrt(jnp.sum(pm**2, axis=-1) * jnp.sum(tm**2, axis=-1))
    return num / den
