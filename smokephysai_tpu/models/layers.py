"""Building-block linen modules with torch-default initialisation.

The reference trains with torch's default inits (kaiming_uniform(a=sqrt(5))
kernels, uniform(+-1/sqrt(fan_in)) biases). Flax defaults (lecun_normal,
zero bias) would change training dynamics, so these wrappers reproduce the
torch scheme for behavioural parity. kaiming_uniform(a=sqrt(5)) over fan_in
equals uniform(+-sqrt(1/fan_in)) == variance_scaling(1/3, fan_in, uniform).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax.nn.initializers import variance_scaling

from smokephysai_tpu.ops.image import conv_transpose_2x

torch_kernel_init = variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _uniform_bound_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class TorchDense(nn.Module):
    """nn.Linear equivalent: y = x W^T + b with torch default init.

    `dtype` sets the computation dtype (params stay float32; cast at use),
    e.g. bfloat16 to run the matmul at MXU bf16 rate."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel", torch_kernel_init, (fan_in, self.features), jnp.float32
        )
        bias = self.param(
            "bias", _uniform_bound_init(fan_in**-0.5), (self.features,), jnp.float32
        )
        x = x.astype(self.dtype)
        return x @ kernel.astype(self.dtype) + bias.astype(self.dtype)


class TorchConv(nn.Module):
    """nn.Conv2d equivalent for NHWC input, stride 1, symmetric padding."""

    features: int
    kernel_size: Tuple[int, int]
    padding: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        c_in = x.shape[-1]
        fan_in = c_in * kh * kw
        kernel = self.param(
            "kernel", torch_kernel_init, (kh, kw, c_in, self.features), jnp.float32
        )
        bias = self.param(
            "bias", _uniform_bound_init(fan_in**-0.5), (self.features,), jnp.float32
        )
        # Output stays in `dtype` (flax nn.Conv convention) — the MXU
        # accumulates bf16 convs in f32 internally regardless, and a
        # preferred_element_type=f32 override would break the conv VJP
        # under mixed precision (f32 cotangent vs bf16 kernel).
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1),
            padding=((self.padding, self.padding), (self.padding, self.padding)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return out + bias.astype(self.dtype)


class TorchConvTranspose2x(nn.Module):
    """nn.ConvTranspose2d(k=4, s=2, p=1) equivalent: doubles spatial size.
    Weight stored in torch layout [C_in, C_out, 4, 4]; torch computes
    fan_in for transposed convs as C_out*k*k."""

    features: int

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        fan_in = self.features * 16
        # kaiming_uniform(a=sqrt(5)) bound = sqrt(1/fan) with torch's
        # transposed-conv fan = C_out*k*k; computed explicitly because jax
        # initializers can't infer torch's fan convention from this layout
        weight = self.param(
            "weight",
            _uniform_bound_init(fan_in**-0.5),
            (c_in, self.features, 4, 4),
            jnp.float32,
        )
        bias = self.param(
            "bias", _uniform_bound_init(fan_in**-0.5), (self.features,), jnp.float32
        )
        return conv_transpose_2x(x, weight, bias)


class TorchBatchNorm(nn.Module):
    """BatchNorm2d equivalent (eps=1e-5, momentum=0.1 in torch convention,
    i.e. running = 0.9*running + 0.1*batch). `axis_name` enables
    cross-replica batch stats under data parallelism — the TPU-native
    upgrade the single-device reference doesn't need (SURVEY.md §7
    'BatchNorm under jit/vmap/pmap')."""

    use_running_average: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x, use_running_average: bool | None = None):
        """`use_running_average` may be fixed at construction (compact
        callers) or passed per call (setup-style callers that can't
        condition construction on `train`)."""
        ura = (
            self.use_running_average
            if use_running_average is None
            else use_running_average
        )
        return nn.BatchNorm(
            use_running_average=ura,
            momentum=0.9,
            epsilon=1e-5,
            axis_name=self.axis_name,
        )(x)
