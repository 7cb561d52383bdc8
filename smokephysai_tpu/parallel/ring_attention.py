"""Ring attention: exact attention over a sequence sharded across a mesh
axis, with K/V blocks rotating around the ICI ring via `lax.ppermute`.

This is the sequence/context-parallel path for scaled token grids
(SURVEY.md §5 'long-context / sequence parallelism': the reference is fixed
at 1024 tokens with full O(L^2) attention, chaos_attention.py:82; the
1024^2 streaming config grows the token grid 32x at the same pool ratio).

Each device holds a [B, H, L/n, D] shard of q/k/v. n-1 rotations stream
every K/V block past every query block; a running max/denominator
(flash-attention style online softmax) keeps the computation exact without
materialising the full [L, L] score matrix on any device.

Works with the fused chaos-attention form unchanged: the chaos term is
folded into q before the matmul (models/chaos_attention.py), so ring
attention over q_eff IS chaos attention.
"""
from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jnp.ndarray

NEG_INF = -1e30


def _ring_attention_local(
    q: Array, k: Array, v: Array, axis_name: str, temperature: float = 1.0
) -> Array:
    """Per-shard body: q/k/v are the local [B, H, L_loc, D] blocks."""
    n = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    B, H, Lq, D = q.shape
    scale = 1.0 / (jnp.sqrt(jnp.float32(D)) * temperature)

    def step(carry, _):
        acc, m, l, kc, vc = carry
        scores = (
            jnp.einsum("bhid,bhjd->bhij", q, kc,
                       preferred_element_type=jnp.float32)
            * scale
        )
        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        corr = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l = l * corr + jnp.sum(p, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bhij,bhjd->bhid", p, vc, preferred_element_type=jnp.float32
        )
        # rotate K/V to the next device on the ring
        perm = [(i, (i + 1) % n) for i in range(n)]
        kc = lax.ppermute(kc, axis_name, perm)
        vc = lax.ppermute(vc, axis_name, perm)
        return (acc, m_new, l, kc, vc), None

    # initial carries must be marked device-varying over the ring axis for
    # shard_map's type system (they meet varying values inside the scan)
    to_varying = lambda x: lax.pcast(x, (axis_name,), to="varying")
    acc0 = to_varying(jnp.zeros((B, H, Lq, D), jnp.float32))
    m0 = to_varying(jnp.full((B, H, Lq), NEG_INF, jnp.float32))
    l0 = to_varying(jnp.zeros((B, H, Lq), jnp.float32))
    (acc, _, l, _, _), _ = lax.scan(
        step, (acc0, m0, l0, k.astype(jnp.float32), v.astype(jnp.float32)),
        None, length=n,
    )
    return (acc / l[..., None]).astype(q.dtype)


def ring_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis_name: str = "space",
    temperature: float = 1.0,
) -> Array:
    """Exact softmax(q k^T / (sqrt(D)*temp)) v with the sequence axis (-2)
    sharded over `axis_name`. q/k/v: [B, H, L, D] global shapes."""
    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(
            _ring_attention_local, axis_name=axis_name, temperature=temperature
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
