"""SmokePhysNet3D: volumetric variant for the 128^3 config
(BASELINE.json configs[3] 'volumetric feature heads'; no reference analog —
the reference is strictly 2D).

Design mirrors the 2D SmokePhysNet (models/net.py): conv encoder ->
fixed-token-grid chaos transformer -> reconstruction + physics heads — with
3D convolutions, an 8^3 = 512-token grid, and three stride-2 transposed
convs back to 8x the token grid. Reuses ChaosTransformerLayer unchanged
(tokens are tokens).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn
from .layers import TorchBatchNorm, _uniform_bound_init, torch_kernel_init
from .net import ChaosTransformerLayer

Array = jnp.ndarray

TOKEN_GRID_3D = 8  # 8^3 = 512 tokens


class Conv3D(nn.Module):
    """3D conv for NDHWC input, stride 1, symmetric padding, torch init."""

    features: int
    kernel_size: int
    padding: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        c_in = x.shape[-1]
        fan_in = c_in * k**3
        kernel = self.param(
            "kernel", torch_kernel_init, (k, k, k, c_in, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", _uniform_bound_init(fan_in**-0.5), (self.features,),
            jnp.float32,
        )
        p = self.padding
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=((p, p), (p, p), (p, p)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        # output stays in `dtype` (a preferred_element_type=f32 override
        # breaks the conv VJP under mixed precision; see layers.TorchConv)
        return out + bias.astype(self.dtype)


class ConvTranspose3D2x(nn.Module):
    """Transposed 3D conv (k=4, s=2, p=1): doubles each spatial dim."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        fan_in = self.features * 64
        weight = self.param(
            "weight", _uniform_bound_init(fan_in**-0.5),
            (c_in, self.features, 4, 4, 4), jnp.float32,
        )
        bias = self.param(
            "bias", _uniform_bound_init(fan_in**-0.5), (self.features,),
            jnp.float32,
        )
        k = jnp.flip(jnp.transpose(weight, (2, 3, 4, 0, 1)), axis=(0, 1, 2))
        out = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            k.astype(self.dtype),
            window_strides=(1, 1, 1),
            padding=((2, 2), (2, 2), (2, 2)),
            lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + bias.astype(self.dtype)


def avg_pool_to(x: Array, out_size: int) -> Array:
    """Mean-pool each spatial dim of NDHWC x down to `out_size` (input dims
    must be multiples of out_size — true for the power-of-two volume
    configs)."""
    B, D, H, W, C = x.shape
    fd, fh, fw = D // out_size, H // out_size, W // out_size
    x = x.reshape(B, out_size, fd, out_size, fh, out_size, fw, C)
    return x.mean(axis=(2, 4, 6))


class SmokePhysNet3D(nn.Module):
    """Volumetric net: NDHWC input [B, D, H, W, 1] -> dict with
    {reconstructed [B,D,H,W,1], physics_features [B,3], latent_features}."""

    hidden_dim: int = 256
    num_layers: int = 4
    num_heads: int = 8
    output_channels: int = 32
    chaos_strength: float = 0.1
    bn_axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # Pallas flash attention (512-token trunk)
    fast_math: bool = False  # bf16 residual + tanh GELU (serving fast path)

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, return_features: bool = False
    ) -> dict:
        B, D, H, W, _ = x.shape
        g = TOKEN_GRID_3D
        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, axis_name=self.bn_axis_name,
            name=name,
        )

        h = Conv3D(32, 5, padding=2, dtype=self.dtype, name="enc_conv1")(x)
        h = jax.nn.relu(bn("enc_bn1")(h))
        h = Conv3D(64, 3, padding=1, dtype=self.dtype, name="enc_conv2")(h)
        h = jax.nn.relu(bn("enc_bn2")(h))
        h = avg_pool_to(h, g)  # [B, 8, 8, 8, 64]
        tokens = h.reshape(B, g**3, 64)

        feats = nn.Dense(
            self.hidden_dim,
            kernel_init=torch_kernel_init,
            name="feature_proj",
        )(tokens)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(1.0),
            (1, g**3, self.hidden_dim), jnp.float32,
        )
        feats = feats + pos

        for i in range(self.num_layers):
            feats = ChaosTransformerLayer(
                self.hidden_dim, self.num_heads, self.chaos_strength,
                dtype=self.dtype, use_flash=self.use_flash,
                fast_math=self.fast_math, name=f"layer_{i}",
            )(feats, deterministic=not train)

        out = nn.Dense(self.output_channels, name="dec")(jax.nn.relu(feats))
        vol = out.reshape(B, g, g, g, self.output_channels)
        vol = ConvTranspose3D2x(16, dtype=self.dtype, name="up1")(vol)
        vol = jax.nn.relu(bn("up_bn1")(vol))
        vol = ConvTranspose3D2x(8, dtype=self.dtype, name="up2")(vol)
        vol = jax.nn.relu(bn("up_bn2")(vol))
        vol = ConvTranspose3D2x(4, dtype=self.dtype, name="up3")(vol)
        vol = jax.nn.relu(bn("up_bn3")(vol))
        vol = Conv3D(1, 3, padding=1, name="recon_out")(vol)
        reconstructed = jax.nn.sigmoid(vol)  # [B, 64, 64, 64, 1] for 8^3 grid

        # resize to input volume if it differs from 8x the token grid
        if reconstructed.shape[1:4] != (D, H, W):
            reconstructed = jax.image.resize(
                reconstructed, (B, D, H, W, 1), method="trilinear"
            )

        pooled = jnp.mean(feats, axis=1)
        phys = nn.Dense(128, name="phys1")(pooled)
        phys = nn.Dense(3, name="phys2")(jax.nn.relu(phys))

        results = {
            "reconstructed": reconstructed,
            "physics_features": phys,
            "latent_features": pooled,
        }
        if return_features:
            results["intermediate_features"] = feats
        return results
