"""Image ops with exact torch semantics, implemented as XLA-friendly
matmuls/reductions.

The reference model depends on three torch ops whose numerics we must
reproduce (SURVEY.md §7 'hard parts'):
  * adaptive average pooling (smokephys_net.py:31, :91)
  * bilinear resize with align_corners=False (pos-emb re-interp,
    smokephys_net.py:98-107)
  * ConvTranspose2d(k=4, s=2, p=1) in the reconstruction head
    (smokephys_net.py:57-66)

All are separable, so both pooling and resize are expressed as two small
dense matmuls (length-H_out x H_in row matrix, then column matrix) — MXU
work instead of gathers, and the matrices are compile-time constants.
Layout is NHWC throughout (TPU-native), vs the reference's NCHW.
"""
from __future__ import annotations

from typing import Tuple

import numpy as np
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def _adaptive_pool_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] averaging matrix for torch AdaptiveAvgPool1d semantics:
    bin i covers [floor(i*in/out), ceil((i+1)*in/out))."""
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        lo = (i * in_size) // out_size
        hi = -((-(i + 1) * in_size) // out_size)  # ceil
        m[i, lo:hi] = 1.0 / (hi - lo)
    return m


def adaptive_avg_pool2d(x: Array, out_hw: Tuple[int, int]) -> Array:
    """torch F.adaptive_avg_pool2d for NHWC input; exact bin boundaries.
    Compile-time constant pooling matrices -> two einsum contractions."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_adaptive_pool_matrix(h_in, h_out))
    mw = jnp.asarray(_adaptive_pool_matrix(w_in, w_out))
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...owc->...opc", mw, x)


def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bilinear weight matrix for torch F.interpolate
    (mode='bilinear', align_corners=False): src = (i+0.5)*in/out - 0.5,
    clamped at 0; two-tap interpolation with the upper tap clamped to the
    last sample."""
    scale = in_size / out_size
    m = np.zeros((out_size, in_size), np.float32)
    for i in range(out_size):
        src = max((i + 0.5) * scale - 0.5, 0.0)
        i0 = int(np.floor(src))
        i1 = min(i0 + 1, in_size - 1)
        w1 = src - i0
        m[i, i0] += 1.0 - w1
        m[i, i1] += w1
    return m


def interpolate_bilinear(x: Array, out_hw: Tuple[int, int]) -> Array:
    """torch F.interpolate(mode='bilinear', align_corners=False) for NHWC
    input, as two constant-matrix contractions (separable kernel)."""
    h_in, w_in = x.shape[-3], x.shape[-2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_resize_matrix(h_in, h_out))
    mw = jnp.asarray(_resize_matrix(w_in, w_out))
    x = jnp.einsum("oh,...hwc->...owc", mh, x)
    return jnp.einsum("pw,...owc->...opc", mw, x)


def conv_transpose_2x(x: Array, weight: Array, bias: Array | None = None) -> Array:
    """torch ConvTranspose2d(k=4, stride=2, padding=1): output is exactly
    2x the spatial size (reconstruction head, smokephys_net.py:58-61).

    x: [N, H, W, C_in]; weight: torch layout [C_in, C_out, 4, 4].
    Implemented as an input-dilated conv with the spatially-flipped kernel:
    zero-stuff by 2, pad (k-1-p)=2, valid conv — which XLA lowers to an MXU
    matmul per tap.
    """
    # torch [C_in, C_out, kh, kw] -> HWIO [kh, kw, C_in, C_out], flipped
    k = jnp.flip(jnp.transpose(weight, (2, 3, 0, 1)), axis=(0, 1))
    out = lax.conv_general_dilated(
        x,
        k,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if bias is not None:
        out = out + bias
    return out
