"""Shared Pallas helpers."""
from __future__ import annotations

import jax


def use_interpret() -> bool:
    """Run kernels in interpreter mode off-TPU (CPU CI per SURVEY.md §4);
    compiled Mosaic on real TPU."""
    return jax.default_backend() != "tpu"
