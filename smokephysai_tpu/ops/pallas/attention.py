"""Blockwise (flash) attention Pallas kernel.

Single-chip counterpart of parallel/ring_attention.py (SURVEY.md §5
long-context plan: 'blockwise/flash attention as a Pallas kernel for long
single-device sequences'). Never materialises the [L, L] score matrix in
HBM: each (batch*head, q-block) program streams K/V blocks through VMEM
with an online-softmax accumulator, so HBM traffic is O(L*D) instead of
O(L^2).

Composes with chaos attention unchanged: the chaos term is folded into q
before the matmul (models/chaos_attention.py), so flash(q_eff, k, v) IS the
reference's gated two-matmul attention. Temperature is folded into the
scale.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .common import use_interpret

Array = jnp.ndarray

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, block_k: int, scale: float):
    q = q_ref[0]  # [BQ, D] (leading dim is the size-1 batch*head block)
    _, L, D = k_ref.shape
    num_kb = L // block_k

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = (
            jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            * scale
        )  # [BQ, BK]
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * corr + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l

    BQ = q.shape[0]
    acc0 = jnp.zeros((BQ, D), jnp.float32)
    m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((BQ, 1), jnp.float32)
    acc, _, l = lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_q", "block_k", "temperature")
)
def flash_attention(
    q: Array,
    k: Array,
    v: Array,
    temperature: float = 1.0,
    block_q: int = 256,
    block_k: int = 512,
) -> Array:
    """softmax(q k^T / (sqrt(D)*temperature)) v for [B, H, L, D] inputs.
    L must divide by the block sizes (the model's 1024-token grid does)."""
    B, H, L, D = q.shape
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    assert L % block_q == 0 and L % block_k == 0
    scale = 1.0 / (float(D) ** 0.5 * temperature)

    qf = q.reshape(B * H, L, D)
    kf = k.reshape(B * H, L, D)
    vf = v.reshape(B * H, L, D)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, scale=scale),
        grid=(B * H, L // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, L, D), q.dtype),
        interpret=use_interpret(),
    )(qf, kf, vf)
    return out.reshape(B, H, L, D)


def _flash_kernel_bld(
    q_ref, k_ref, v_ref, o_ref, *, num_heads: int, block_k: int, scale: float
):
    _, L, D = k_ref.shape
    hd = D // num_heads
    num_kb = L // block_k
    q_all = q_ref[0]  # [BQ, D]
    BQ = q_all.shape[0]

    for h in range(num_heads):  # static unroll; head = a column slice
        q = q_all[:, h * hd : (h + 1) * hd]

        def body(kb, carry):
            acc, m, l = carry
            k_blk = k_ref[0, pl.ds(kb * block_k, block_k), h * hd : (h + 1) * hd]
            v_blk = v_ref[0, pl.ds(kb * block_k, block_k), h * hd : (h + 1) * hd]
            s = (
                jax.lax.dot_general(
                    q, k_blk, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            corr = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            l = l * corr + jnp.sum(p, axis=-1, keepdims=True)
            acc = acc * corr + jax.lax.dot_general(
                p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, m_new, l

        acc0 = jnp.zeros((BQ, hd), jnp.float32)
        m0 = jnp.full((BQ, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((BQ, 1), jnp.float32)
        acc, _, l = lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
        o_ref[0, :, h * hd : (h + 1) * hd] = (acc / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "block_k", "temperature")
)
def flash_attention_tokens(
    q: Array,
    k: Array,
    v: Array,
    num_heads: int,
    temperature: float = 1.0,
    block_q: int = 256,
    block_k: int = 1024,
) -> Array:
    """Multi-head flash attention straight on token-major [B, L, D]
    projections (D = num_heads * head_dim, torch head convention: head h is
    the column slice [h*hd, (h+1)*hd)). Heads are a static loop over column
    slices inside the kernel, so there are NO [B,L,H,hd]<->[B,H,L,hd]
    relayout transposes around the call — on v5e those run at ~120 GB/s and
    cost ~1 ms each at batch 64, which made them ~25% of a transformer
    layer. K/V for ALL heads stay VMEM-resident per (batch, q-block)
    program and are reused by every head's pass."""
    B, L, D = q.shape
    assert D % num_heads == 0
    block_q = min(block_q, L)
    block_k = min(block_k, L)
    assert L % block_q == 0 and L % block_k == 0
    scale = 1.0 / (float(D // num_heads) ** 0.5 * temperature)

    out = pl.pallas_call(
        functools.partial(
            _flash_kernel_bld, num_heads=num_heads, block_k=block_k, scale=scale
        ),
        grid=(B, L // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, D), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, D), q.dtype),
        interpret=use_interpret(),
    )(q, k, v)
    return out
