"""Matplotlib visualisation utilities (API parity with reference
src/utils/visualization.py:7-116): dark-background frame grids, chaos
feature time-series, attention triptych. Headless-safe (Agg; plt.show only
when interactive)."""
from __future__ import annotations

import sys
from typing import Dict, List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _show():
    if hasattr(sys, "ps1") or plt.get_backend().lower() not in ("agg",):
        plt.show()
    plt.close("all")


class SmokeVisualizer:
    """Reference visualization.py:7-116; accepts numpy or JAX arrays."""

    def __init__(self, figsize: tuple = (12, 8)):
        self.figsize = figsize
        plt.style.use("dark_background")

    def plot_smoke_evolution(
        self, density_sequence: List, save_path: Optional[str] = None
    ):
        """Grid of frames, <=8 per row (reference visualization.py:14-50)."""
        frames = [np.asarray(d) for d in density_sequence]
        n = len(frames)
        cols = min(8, n)
        rows = -(-n // cols)
        fig, axes = plt.subplots(rows, cols, figsize=(cols * 2, rows * 2))
        axes = np.atleast_2d(axes)
        for i, frame in enumerate(frames):
            ax = axes[divmod(i, cols)]
            ax.imshow(frame, cmap="hot", interpolation="bilinear")
            ax.set_title(f"Frame {i}")
            ax.axis("off")
        for i in range(n, rows * cols):
            axes[divmod(i, cols)].axis("off")
        plt.tight_layout()
        if save_path:
            plt.savefig(save_path, dpi=150, bbox_inches="tight")
        _show()

    def plot_chaos_features(
        self, chaos_metrics: Dict[str, List[float]], save_path: Optional[str] = None
    ):
        """1x3 time-series of the chaos features
        (reference visualization.py:52-72)."""
        fig, axes = plt.subplots(1, 3, figsize=self.figsize)
        names = ["lyapunov_exponent", "fractal_dimension", "entropy"]
        titles = ["Lyapunov Exponent", "Fractal Dimension", "Entropy"]
        for ax, name, title in zip(axes, names, titles):
            if name in chaos_metrics:
                ax.plot(chaos_metrics[name], "o-", linewidth=2, markersize=4)
                ax.set_title(title)
                ax.set_xlabel("Time Step")
                ax.grid(True, alpha=0.3)
        plt.tight_layout()
        if save_path:
            plt.savefig(save_path, dpi=150, bbox_inches="tight")
        _show()

    def plot_attention_maps(
        self, attention_weights, input_image, save_path: Optional[str] = None
    ):
        """Input | attention matrix | mean attention reshaped to the token
        grid (reference visualization.py:74-116)."""
        attn = np.asarray(attention_weights)[0, 0]
        img = np.asarray(input_image)
        if img.ndim == 4:  # NHWC or NCHW single sample
            img = img[0, ..., 0] if img.shape[-1] == 1 else img[0, 0]

        fig, axes = plt.subplots(1, 3, figsize=(15, 5))
        axes[0].imshow(img, cmap="hot")
        axes[0].set_title("Input Smoke")
        axes[0].axis("off")

        im1 = axes[1].imshow(attn, cmap="viridis")
        axes[1].set_title("Attention Matrix")
        axes[1].set_xlabel("Key Position")
        axes[1].set_ylabel("Query Position")
        plt.colorbar(im1, ax=axes[1])

        avg = attn.mean(axis=0)
        side = int(np.sqrt(len(avg)))
        if side * side == len(avg):
            im2 = axes[2].imshow(avg.reshape(side, side), cmap="plasma")
            axes[2].set_title("Average Attention")
            axes[2].axis("off")
            plt.colorbar(im2, ax=axes[2])

        plt.tight_layout()
        if save_path:
            plt.savefig(save_path, dpi=150, bbox_inches="tight")
        _show()
