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

The forward is factored into `encode` / `trunk` / `decode` methods (setup
style, identical parameter tree to the original compact version — proven by
the weight-port golden, tests/test_torch_port.py) so the serving layer can
splice parallel trunk schedules in between — e.g. GPipe pipelining of the
six transformer layers over a mesh axis (parallel/pipeline.py,
serving.make_pipelined_predictor).
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
    (reference smokephys_net.py:136-167). `chaos_key` overrides the 'chaos'
    RNG stream (used by the pipelined trunk, where stages derive keys from
    their mesh position instead of linen's per-path folding)."""

    dim: int
    num_heads: int
    chaos_strength: float = 0.1
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32
    fast_math: bool = False  # keep the residual stream in `dtype` (bf16):
    # halves trunk HBM traffic on the serving path. Documented divergence —
    # the parity path keeps the residual in f32 like the torch reference.
    use_flash: bool = False
    ring_axis: str | None = None
    ring_mesh: object = None
    sp_impl: str = "ring"

    @nn.compact
    def __call__(
        self,
        x: Array,
        deterministic: bool = False,
        chaos_key: Array | None = None,
    ) -> Array:
        res_dtype = self.dtype if self.fast_math else jnp.float32
        attn = ChaosAttention(
            self.dim, self.num_heads, self.chaos_strength, dtype=self.dtype,
            out_dtype=res_dtype,
            use_flash=self.use_flash, ring_axis=self.ring_axis,
            ring_mesh=self.ring_mesh, sp_impl=self.sp_impl,
            name="chaos_attention",
        )
        x = x.astype(res_dtype)
        x = x + attn(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), chaos_key=chaos_key
        )

        y = nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        y = TorchDense(4 * self.dim, dtype=self.dtype, name="ffn_in")(y)
        # torch nn.GELU default is the exact erf form; erf costs ~2 ms/layer
        # of VPU time at batch 64 on v5e, so fast_math uses the tanh approx
        # (max |delta| ~3e-4, below bf16 resolution)
        y = jax.nn.gelu(y, approximate=self.fast_math)
        y = nn.Dropout(self.dropout)(y, deterministic=deterministic)
        y = TorchDense(self.dim, dtype=self.dtype, name="ffn_out")(y)
        y = y.astype(res_dtype)
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
    fast_math: bool = False  # bf16 residual stream in the trunk (serving
    # fast path; see ChaosTransformerLayer.fast_math)
    fast_encoder: bool = False  # pool oversize inputs to input_dim^2 BEFORE
    # the conv encoder (documented divergence, PARITY.md): the parity path
    # runs enc_conv2 at full resolution then pools — ~154 GFLOP/frame and a
    # 268 MB activation at 1024^2 for features that are immediately pooled
    # to the 32^2 token grid. Pool-first cuts encoder cost ~64x at 1024^2;
    # exact no-op whenever the input is already input_dim^2.
    use_flash: bool = False  # route attention through the Pallas flash
    # kernel (ops/pallas/attention.py); has a Pallas custom VJP, so it
    # serves both inference and training
    ring_axis: str | None = None  # sequence parallelism over this mesh axis
    ring_mesh: object = None  # jax.sharding.Mesh backing ring_axis
    sp_impl: str = "ring"  # 'ring' (ppermute K/V) or 'ulysses' (all-to-all)

    def setup(self):
        self.enc_conv1 = TorchConv(64, (7, 7), padding=3, dtype=self.dtype)
        self.enc_bn1 = TorchBatchNorm(axis_name=self.bn_axis_name)
        self.enc_conv2 = TorchConv(128, (3, 3), padding=1, dtype=self.dtype)
        self.enc_bn2 = TorchBatchNorm(axis_name=self.bn_axis_name)
        self.feature_proj = TorchDense(self.hidden_dim, dtype=self.dtype)
        self.pos_embedding = self.param(
            "pos_embedding",
            nn.initializers.normal(1.0),  # torch.randn
            (1, self.input_dim * self.input_dim, self.hidden_dim),
            jnp.float32,
        )
        layer_cls = (
            nn.remat(ChaosTransformerLayer, static_argnums=(2,))
            if self.remat
            else ChaosTransformerLayer
        )
        for i in range(self.num_layers):
            setattr(
                self,
                f"layer_{i}",
                layer_cls(
                    self.hidden_dim,
                    self.num_heads,
                    self.chaos_strength,
                    dtype=self.dtype,
                    fast_math=self.fast_math,
                    use_flash=self.use_flash,
                    ring_axis=self.ring_axis,
                    ring_mesh=self.ring_mesh,
                    sp_impl=self.sp_impl,
                ),
            )
        self.dec1 = TorchDense(256, dtype=self.dtype)
        self.dec2 = TorchDense(self.output_channels, dtype=self.dtype)
        self.up1 = TorchConvTranspose2x(32)
        self.up_bn1 = TorchBatchNorm(axis_name=self.bn_axis_name)
        self.up2 = TorchConvTranspose2x(16)
        self.up_bn2 = TorchBatchNorm(axis_name=self.bn_axis_name)
        self.recon_out = TorchConv(1, (3, 3), padding=1)
        self.phys1 = TorchDense(256)
        self.phys2 = TorchDense(3)

    def encode(self, x: Array, train: bool = False) -> Array:
        """Conv encoder + pool to the 32x32 token grid + projection +
        (re-interpolated) positional embedding (smokephys_net.py:24-38,
        :87-107). Returns token features [B, 1024, hidden_dim]."""
        B = x.shape[0]
        if self.fast_encoder and max(x.shape[1:3]) > self.input_dim:
            # fast-serving divergence: pool OVERSIZE frames to the working
            # resolution first (see class docstring); the parity path pools
            # AFTER enc_conv2 instead. Sub-input_dim frames keep the native
            # resolution — upsampling them would 4x the conv cost for no
            # benefit.
            x = adaptive_avg_pool2d(x, (self.input_dim, self.input_dim))
        # 1. conv encoder (smokephys_net.py:24-32)
        h = self.enc_conv1(x)
        h = jax.nn.relu(self.enc_bn1(h, use_running_average=not train))
        h = self.enc_conv2(h)
        h = jax.nn.relu(self.enc_bn2(h, use_running_average=not train))
        h = adaptive_avg_pool2d(h, (self.input_dim, self.input_dim))

        # memory-reduction pool to the 32x32 token grid (smokephys_net.py:90-92)
        h = adaptive_avg_pool2d(h, (TOKEN_GRID, TOKEN_GRID))
        tokens = h.reshape(B, TOKEN_GRID * TOKEN_GRID, 128)

        # 2. project + positional embedding (smokephys_net.py:35-38, :95-107)
        feats = self.feature_proj(tokens).astype(jnp.float32)
        pos = self.pos_embedding
        if TOKEN_GRID * TOKEN_GRID != self.input_dim * self.input_dim:
            pos_img = pos.reshape(1, self.input_dim, self.input_dim, self.hidden_dim)
            pos_img = interpolate_bilinear(pos_img, (TOKEN_GRID, TOKEN_GRID))
            pos = pos_img.reshape(1, TOKEN_GRID * TOKEN_GRID, self.hidden_dim)
        return feats + pos

    def trunk(self, feats: Array, train: bool = False) -> Array:
        """Sequential chaos transformer trunk (smokephys_net.py:41-47,
        :110-111). The pipelined alternative runs the same stacked layer
        params through parallel/pipeline.pipeline_apply."""
        for i in range(self.num_layers):
            feats = getattr(self, f"layer_{i}")(feats, not train)
        # decode/heads contract stays f32 regardless of the trunk's
        # residual dtype (fast_math)
        return feats.astype(jnp.float32)

    def decode(
        self,
        feats: Array,
        in_hw: tuple,
        train: bool = False,
        return_features: bool = False,
    ) -> dict:
        """Token decoder + reconstruction head + physics head
        (smokephys_net.py:50-73, :114-132)."""
        B = feats.shape[0]
        out = self.dec1(feats)
        out = jax.nn.relu(out)
        out = self.dec2(out).astype(jnp.float32)

        # reconstruction head: 32x32 -> 128x128 (smokephys_net.py:57-66)
        img = out.reshape(B, TOKEN_GRID, TOKEN_GRID, self.output_channels)
        img = self.up1(img)
        img = jax.nn.relu(self.up_bn1(img, use_running_average=not train))
        img = self.up2(img)
        img = jax.nn.relu(self.up_bn2(img, use_running_average=not train))
        img = self.recon_out(img)
        reconstructed = jax.nn.sigmoid(img)
        # The reference's head always emits 4x the fixed 32x32 token grid =
        # 128x128 and crashes on any other input size (smokephys_net.py:117-118
        # vs the loss in train.py:69). Documented divergence: we resize to the
        # input resolution so 64^2/256^2 grids (BASELINE.json configs) work;
        # at the reference's 128^2 this is a no-op.
        if reconstructed.shape[1:3] != tuple(in_hw):
            reconstructed = interpolate_bilinear(reconstructed, tuple(in_hw))

        # physics head on mean-pooled tokens (smokephys_net.py:69-73, :121-122)
        pooled = jnp.mean(feats, axis=1)
        phys = self.phys1(pooled)
        phys = jax.nn.relu(phys)
        phys = self.phys2(phys)

        results = {
            "reconstructed": reconstructed,
            "physics_features": phys,
            "latent_features": pooled,
        }
        if return_features:
            results["intermediate_features"] = feats
        return results

    def __call__(
        self, x: Array, train: bool = False, return_features: bool = False
    ) -> dict:
        feats = self.encode(x, train)
        feats = self.trunk(feats, train)
        return self.decode(
            feats, (x.shape[1], x.shape[2]), train, return_features
        )
