"""Golden-parity tests for torch-semantics image ops (goldens produced by
torch on CPU, scripts/make_goldens.py)."""
import os

import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.ops.image import (
    adaptive_avg_pool2d,
    conv_transpose_2x,
    interpolate_bilinear,
)

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


@pytest.fixture(scope="module")
def ops_golden():
    return np.load(os.path.join(GOLDENS, "torch_ops.npz"))


@pytest.fixture(scope="module")
def conv_golden():
    return np.load(os.path.join(GOLDENS, "conv_ops.npz"))


def nchw_to_nhwc(x):
    return np.transpose(x, (0, 2, 3, 1))


def test_interpolate_matches_torch(ops_golden):
    x = jnp.asarray(nchw_to_nhwc(ops_golden["x"]))
    out = interpolate_bilinear(x, (5, 5))
    np.testing.assert_allclose(
        np.asarray(out), nchw_to_nhwc(ops_golden["interp_5"]), atol=1e-6
    )


def test_adaptive_pool_even_matches_torch(ops_golden):
    x = jnp.asarray(nchw_to_nhwc(ops_golden["x"]))
    out = adaptive_avg_pool2d(x, (4, 4))
    np.testing.assert_allclose(
        np.asarray(out), nchw_to_nhwc(ops_golden["pool_4"]), atol=1e-6
    )


def test_adaptive_pool_odd_matches_torch(ops_golden):
    x = jnp.asarray(nchw_to_nhwc(ops_golden["x"]))
    out = adaptive_avg_pool2d(x, (5, 5))
    np.testing.assert_allclose(
        np.asarray(out), nchw_to_nhwc(ops_golden["pool_5"]), atol=1e-6
    )


def test_adaptive_pool_identity():
    x = jnp.ones((1, 8, 8, 2))
    assert adaptive_avg_pool2d(x, (8, 8)) is x


def test_conv_transpose_matches_torch(conv_golden):
    x = jnp.asarray(nchw_to_nhwc(conv_golden["x"]))
    out = conv_transpose_2x(
        x, jnp.asarray(conv_golden["ctw"]), jnp.asarray(conv_golden["ctb"])
    )
    np.testing.assert_allclose(
        np.asarray(out), nchw_to_nhwc(conv_golden["ct_out"]), atol=1e-5
    )
