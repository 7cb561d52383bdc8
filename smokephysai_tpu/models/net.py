"""SmokePhysNet: CNN encoder -> chaos-gated transformer -> reconstruction +
physics-feature heads.

Re-design of reference src/models/smokephys_net.py:7-167 in NHWC (TPU-native
layout) with identical architecture hyperparameters (config.yaml:12-18) and
semantics, including:
  * double adaptive pooling: encoder pools to (input_dim, input_dim) then
    the trunk force-pools to 32x32 tokens (smokephys_net.py:31, :90-92)
  * learned pos-embedding sized input_dim^2, bilinearly re-interpolated
    whenever the token count differs (smokephys_net.py:35, :98-107)
  * pre-LN transformer blocks with exact-GELU FFN and dropout 0.1
    (smokephys_net.py:136-167)
  * reconstruction head of two stride-2 transposed convs: output is always
    4x the 32x32 token grid = 128x128 (smokephys_net.py:57-66, :117-118)
  * physics head on mean-pooled tokens -> 3 chaos features
    (smokephys_net.py:69-73, :121-122)

Returns the same dict contract {reconstructed, physics_features,
latent_features[, intermediate_features]} (smokephys_net.py:124-132).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from smokephysai_tpu.ops.image import adaptive_avg_pool2d, interpolate_bilinear
from .chaos_attention import ChaosAttention
from .layers import TorchBatchNorm, TorchConv, TorchConvTranspose2x, TorchDense

Array = jnp.ndarray

TOKEN_GRID = 32  # reference smokephys_net.py:90 'reduced_size'


class ChaosTransformerLayer(nn.Module):
    """Pre-LN block: x += ChaosAttn(LN(x)); x += FFN(LN(x))
    (reference smokephys_net.py:136-167)."""

    dim: int
    num_heads: int
    chaos_strength: float = 0.1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    use_flash: bool = False  # Pallas blockwise attention for the score path
    ring_axis: str | None = None  # SP/CP: shard tokens over this mesh axis
    ring_mesh: object = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = False) -> Array:
        attn = ChaosAttention(
            self.dim, self.num_heads, self.chaos_strength, dtype=self.dtype,
            use_flash=self.use_flash, ring_axis=self.ring_axis,
            ring_mesh=self.ring_mesh,
            name="chaos_attention",
        )
        x = x + attn(nn.LayerNorm(epsilon=1e-5, name="norm1")(x))

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = TorchDense(4 * self.dim, dtype=self.dtype, name="ffn_in")(y)
        y = jax.nn.gelu(y, approximate=False)  # torch nn.GELU default
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = TorchDense(self.dim, dtype=self.dtype, name="ffn_out")(y)
        y = y.astype(jnp.float32)  # residual stream stays f32
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        return x + y


class SmokePhysNet(nn.Module):
    """Main network (reference smokephys_net.py:7-133). NHWC input
    [B, H, W, 1]; `train=True` enables batch-stat updates and dropout.
    `bn_axis_name` syncs BatchNorm statistics across a mesh axis under data
    parallelism (absent in the single-device reference)."""

    input_dim: int = 128
    hidden_dim: int = 512
    num_layers: int = 6
    num_heads: int = 8
    output_channels: int = 64
    chaos_strength: float = 0.1
    bn_axis_name: str | None = None
    dtype: jnp.dtype = jnp.float32  # compute dtype; bfloat16 = MXU fast path
    remat: bool = False  # jax.checkpoint each transformer block (activation
    # memory ~ 1 block instead of num_layers; for big batches / 1024^2 grids)
    use_flash: bool = False  # route attention through the Pallas flash
    # kernel (ops/pallas/attention.py); inference/eval path — the kernel has
    # no custom VJP, so training keeps the einsum path
    ring_axis: str | None = None  # ring attention over this mesh axis (SP)
    ring_mesh: object = None  # jax.sharding.Mesh backing ring_axis

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, return_features: bool = False
    ) -> dict:
        B = x.shape[0]
        bn = lambda name: TorchBatchNorm(
            use_running_average=not train, axis_name=self.bn_axis_name, name=name
        )

        # 1. conv encoder (smokephys_net.py:24-32)
        h = TorchConv(64, (7, 7), padding=3, dtype=self.dtype, name="enc_conv1")(x)
        h = jax.nn.relu(bn("enc_bn1")(h))
        h = TorchConv(128, (3, 3), padding=1, dtype=self.dtype, name="enc_conv2")(h)
        h = jax.nn.relu(bn("enc_bn2")(h))
        h = adaptive_avg_pool2d(h, (self.input_dim, self.input_dim))

        # memory-reduction pool to the 32x32 token grid (smokephys_net.py:90-92)
        h = adaptive_avg_pool2d(h, (TOKEN_GRID, TOKEN_GRID))
        tokens = h.reshape(B, TOKEN_GRID * TOKEN_GRID, 128)

        # 2. project + positional embedding (smokephys_net.py:35-38, :95-107)
        feats = TorchDense(
            self.hidden_dim, dtype=self.dtype, name="feature_proj"
        )(tokens).astype(jnp.float32)
        pos = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),  # torch.randn
            (1, self.input_dim * self.input_dim, self.hidden_dim),
            jnp.float32,
        )
        if TOKEN_GRID * TOKEN_GRID != self.input_dim * self.input_dim:
            pos_img = pos.reshape(1, self.input_dim, self.input_dim, self.hidden_dim)
            pos_img = interpolate_bilinear(pos_img, (TOKEN_GRID, TOKEN_GRID))
            pos = pos_img.reshape(1, TOKEN_GRID * TOKEN_GRID, self.hidden_dim)
        feats = feats + pos

        # 3. chaos transformer trunk (smokephys_net.py:41-47, :110-111)
        layer_cls = (
            nn.remat(ChaosTransformerLayer, static_argnums=(2,))
            if self.remat
            else ChaosTransformerLayer
        )
        for i in range(self.num_layers):
            feats = layer_cls(
                self.hidden_dim,
                self.num_heads,
                self.chaos_strength,
                dtype=self.dtype,
                use_flash=self.use_flash,
                ring_axis=self.ring_axis,
                ring_mesh=self.ring_mesh,
                name=f"layer_{i}",
            )(feats, not train)

        # 4. token decoder (smokephys_net.py:50-54, :114)
        out = TorchDense(256, dtype=self.dtype, name="dec1")(feats)
        out = jax.nn.relu(out)
        out = TorchDense(
            self.output_channels, dtype=self.dtype, name="dec2"
        )(out).astype(jnp.float32)

        # 5. reconstruction head: 32x32 -> 128x128 (smokephys_net.py:57-66)
        img = out.reshape(B, TOKEN_GRID, TOKEN_GRID, self.output_channels)
        img = TorchConvTranspose2x(32, name="up1")(img)
        img = jax.nn.relu(bn("up_bn1")(img))
        img = TorchConvTranspose2x(16, name="up2")(img)
        img = jax.nn.relu(bn("up_bn2")(img))
        img = TorchConv(1, (3, 3), padding=1, name="recon_out")(img)
        reconstructed = jax.nn.sigmoid(img)
        # The reference's head always emits 4x the fixed 32x32 token grid =
        # 128x128 and crashes on any other input size (smokephys_net.py:117-118
        # vs the loss in train.py:69). Documented divergence: we resize to the
        # input resolution so 64^2/256^2 grids (BASELINE.json configs) work;
        # at the reference's 128^2 this is a no-op.
        in_hw = (x.shape[1], x.shape[2])
        if reconstructed.shape[1:3] != in_hw:
            reconstructed = interpolate_bilinear(reconstructed, in_hw)

        # 6. physics head on mean-pooled tokens (smokephys_net.py:69-73, :121-122)
        pooled = jnp.mean(feats, axis=1)
        phys = TorchDense(256, name="phys1")(pooled)
        phys = jax.nn.relu(phys)
        phys = TorchDense(3, name="phys2")(phys)

        results = {
            "reconstructed": reconstructed,
            "physics_features": phys,
            "latent_features": pooled,
        }
        if return_features:
            results["intermediate_features"] = feats
        return results
