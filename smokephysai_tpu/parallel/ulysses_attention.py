"""Ulysses-style sequence parallelism: head-scatter all-to-all attention.

The alternative to ring attention for sequence-sharded token grids
(SURVEY.md §5 'Ulysses-style head-scatter all-to-all is the alternative for
the 8-head model'). Where ring attention streams K/V blocks around the ICI
ring (n-1 ppermute hops, online softmax), Ulysses does TWO all-to-alls:

  1. re-shard [B, H, L/n, D] (sequence-sharded) -> [B, H/n, L, D]
     (head-sharded): every device now sees the FULL sequence for its own
     H/n heads,
  2. plain full attention locally (no online-softmax bookkeeping, one
     softmax per head — lower latency than n-1 ring steps when H >= n),
  3. all-to-all back to sequence sharding for the (sequence-parallel)
     out-projection and FFN.

Requires num_heads % axis_size == 0 (the 8-head model supports up to an
8-way sequence axis). Composes with the fused chaos form unchanged: the
chaos term is folded into q before the matmul (models/chaos_attention.py),
so ulysses(q_eff, k, v) IS chaos attention.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jnp.ndarray


def _ulysses_local(
    q: Array, k: Array, v: Array, axis_name: str, temperature: float = 1.0
) -> Array:
    """Per-shard body: q/k/v are local [B, H, L/n, D] sequence shards."""
    n = lax.axis_size(axis_name)
    H = q.shape[1]
    assert H % n == 0, f"num_heads {H} must divide by sequence-axis size {n}"
    D = q.shape[-1]
    scale = 1.0 / (jnp.sqrt(jnp.float32(D)) * temperature)

    # scatter heads / gather sequence: [B, H, L/n, D] -> [B, H/n, L, D]
    a2a = lambda x: lax.all_to_all(x, axis_name, split_axis=1, concat_axis=2,
                                   tiled=True)
    qh, kh, vh = a2a(q), a2a(k), a2a(v)

    scores = (
        jnp.einsum("bhid,bhjd->bhij", qh, kh,
                   preferred_element_type=jnp.float32)
        * scale
    )
    attn = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("bhij,bhjd->bhid", attn, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)

    # gather heads / scatter sequence back: [B, H/n, L, D] -> [B, H, L/n, D]
    return lax.all_to_all(out, axis_name, split_axis=2, concat_axis=1,
                          tiled=True)


def ulysses_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis_name: str = "space",
    temperature: float = 1.0,
) -> Array:
    """Exact softmax(q k^T / (sqrt(D)*temp)) v with the sequence axis (-2)
    sharded over `axis_name`, via head-scatter all-to-all. q/k/v:
    [B, H, L, D] global shapes; H must divide by the axis size."""
    spec = P(None, None, axis_name, None)
    fn = shard_map(
        functools.partial(
            _ulysses_local, axis_name=axis_name, temperature=temperature
        ),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return fn(q, k, v)
