"""Chaos-modulated multi-head attention.

Re-design of reference src/models/chaos_attention.py:6-114. Semantics are
identical; two TPU-native changes:

1. **Explicit PRNG.** The reference draws fresh `torch.randn` noise inside
   every forward pass (chaos_attention.py:50-52), making even eval
   nondeterministic. Here the Lorenz initial condition comes from a linen
   RNG collection ('chaos'), so training is stochastic under a threaded key
   and benchmarks are reproducible under a fixed key (SURVEY.md §7
   'nondeterminism policy').

2. **Fused score matmul.** The reference computes two [B,h,L,L] score
   matmuls — q@k^T and chaos@k^T — and combines them after gating
   (chaos_attention.py:82, :92-100). Because the gate g is per-query-row
   ([B,1,L,1]), the combination is algebraically

       scores + s * g * (c @ k^T) == ((q + s*g*c) @ k^T) / sqrt(d)

   so we add the gated chaos features into q *before* the matmul: one MXU
   pass instead of two, exactly equal numerics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from .layers import TorchDense

Array = jnp.ndarray

LORENZ_SIGMA = 10.0  # reference chaos_attention.py:35
LORENZ_RHO = 28.0  # reference chaos_attention.py:36
LORENZ_BETA = 8.0 / 3.0  # reference chaos_attention.py:37
LORENZ_DT = 0.01  # reference chaos_attention.py:39
LORENZ_STEPS = 5  # reference chaos_attention.py:55


def lorenz_trajectory(key: Array, batch: int, steps: int = LORENZ_STEPS) -> Array:
    """[B, steps, 3] Euler-integrated Lorenz states from a 0.1*N(0,1) init
    (reference chaos_attention.py:39-57)."""
    init = 0.1 * jax.random.normal(key, (batch, 3))

    def euler(state, _):
        x, y, z = state[..., 0], state[..., 1], state[..., 2]
        dx = LORENZ_SIGMA * (y - x)
        dy = x * (LORENZ_RHO - z) - y
        dz = x * y - LORENZ_BETA * z
        nxt = jnp.stack(
            [x + LORENZ_DT * dx, y + LORENZ_DT * dy, z + LORENZ_DT * dz], axis=-1
        )
        return nxt, nxt

    _, traj = jax.lax.scan(euler, init, None, length=steps)
    return jnp.transpose(traj, (1, 0, 2))  # [B, steps, 3]


def chaos_field(key: Array, batch: int, seq_len: int) -> Array:
    """Tile the 5-step Lorenz trajectory along the sequence axis to
    [B, L, 3] (reference chaos_attention.py:59-66)."""
    traj = lorenz_trajectory(key, batch)
    n_repeats = -(-seq_len // LORENZ_STEPS)
    return jnp.tile(traj, (1, n_repeats, 1))[:, :seq_len, :]


class ChaosAttention(nn.Module):
    """MHA + Lorenz-gated additive chaos scores
    (reference chaos_attention.py:6-114)."""

    dim: int
    num_heads: int = 8
    chaos_strength: float = 0.1
    temperature: float = 1.0
    dtype: jnp.dtype = jnp.float32  # compute dtype (bf16 for MXU fast path)
    out_dtype: jnp.dtype = jnp.float32  # residual-stream dtype; fast_math
    # serving keeps it == dtype (bf16) to halve trunk HBM traffic
    use_flash: bool = False  # Pallas blockwise attention (ops/pallas/attention)
    ring_axis: str | None = None  # mesh axis for sequence parallelism; the
    # token axis is sharded over this axis
    ring_mesh: object = None  # jax.sharding.Mesh for ring_axis (static field)
    sp_impl: str = "ring"  # 'ring' = ppermute K/V rotation (any axis size);
    # 'ulysses' = head-scatter all-to-all (needs num_heads % axis size == 0)

    @nn.compact
    def __call__(
        self, x: Array, mask: Array | None = None, chaos_key: Array | None = None
    ) -> Array:
        B, L, D = x.shape
        h = self.num_heads
        hd = D // h
        assert D % h == 0

        dense = lambda f, name: TorchDense(f, dtype=self.dtype, name=name)
        q = dense(D, "q_proj")(x)
        k = dense(D, "k_proj")(x)
        v = dense(D, "v_proj")(x)

        if chaos_key is None:
            chaos_key = self.make_rng("chaos")
        field = chaos_field(chaos_key, B, L)  # [B, L, 3]
        chaos_feats = dense(D, "chaos_proj")(field)  # [B, L, D]
        gate = jax.nn.sigmoid(
            dense(1, "chaos_gate")(chaos_feats).astype(jnp.float32)
        ).astype(self.dtype)  # [B, L, 1]

        # fused: q_eff @ k^T == q @ k^T + strength * gate * (chaos @ k^T)
        q_eff = q + jnp.asarray(self.chaos_strength, self.dtype) * gate * chaos_feats

        split = lambda t: t.reshape(B, L, h, hd).transpose(0, 2, 1, 3)

        if self.ring_axis is not None and mask is None:
            if self.sp_impl == "ulysses":
                from smokephysai_tpu.parallel.ulysses_attention import (
                    ulysses_attention as ring_attention,
                )
            else:
                from smokephysai_tpu.parallel.ring_attention import ring_attention

            out = ring_attention(
                split(q_eff),
                split(k),
                split(v),
                mesh=self.ring_mesh,
                axis_name=self.ring_axis,
                temperature=self.temperature,
            )
            out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
            return dense(D, "out_proj")(out).astype(self.out_dtype)

        if self.use_flash and mask is None:
            from smokephysai_tpu.ops.pallas.attention import (
                flash_attention_tokens_trainable,
            )

            # token-major [B, L, D] path: no head split/merge transposes
            # around the kernel (see flash_attention_tokens). The trainable
            # variant has a Pallas custom VJP, so this path now serves
            # training too (the einsum path's [L,L] f32 score matrices were
            # ~2/3 of the whole train step at batch 8).
            out = flash_attention_tokens_trainable(
                q_eff, k, v, h, self.temperature
            )
            return dense(D, "out_proj")(out).astype(self.out_dtype)

        scores = jnp.einsum(
            "bhid,bhjd->bhij", split(q_eff), split(k),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(hd))

        if mask is not None:
            scores = jnp.where(
                mask[:, None, None, :] == 0, jnp.float32(-jnp.inf), scores
            )

        # scores accumulate in f32 (preferred_element_type); softmax in f32
        attn = jax.nn.softmax(scores / self.temperature, axis=-1).astype(self.dtype)
        # expose the probability matrix to callers that request the
        # 'intermediates' collection (inference.py --save_attention ->
        # SmokeVisualizer.plot_attention_maps, which is dead code in the
        # reference — visualization.py:74-116 has no caller there). Only the
        # einsum path materialises [B,h,L,L] probs; flash/ring never do (the
        # online-softmax formulation is the whole point), so attention
        # capture requires use_flash=False and no ring_axis. DCE'd when the
        # collection is not mutable.
        self.sow("intermediates", "attn_weights", attn)
        out = jnp.einsum(
            "bhij,bhjd->bhid", attn, split(v),
            preferred_element_type=jnp.float32,
        )
        out = out.transpose(0, 2, 1, 3).reshape(B, L, D)
        return dense(D, "out_proj")(out).astype(self.out_dtype)
