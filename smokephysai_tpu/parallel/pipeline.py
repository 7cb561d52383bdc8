"""Pipeline parallelism: GPipe-style microbatched stage execution over a
mesh axis.

SURVEY.md §2.6 lists PP as an optional build component: 'stage the 6
transformer layers over a mesh axis with microbatching'. This module is the
generic runner: identical-structure stage parameters are stacked on a
leading axis and sharded over `axis_name`; microbatches flow through the
stage ring via `lax.ppermute`, so at steady state all stages compute
concurrently on different microbatches (classic M + S - 1 tick schedule).

The chaos-transformer trunk qualifies directly: all `num_layers` blocks
share one parameter structure, so `jax.vmap`-stacked layer params are the
`stacked_params` input and one `ChaosTransformerLayer.apply` is `stage_fn`.
"""
from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, PartitionSpec as P

Array = jnp.ndarray


def _pipeline_local(
    stacked_params: Any,
    microbatches: Array,
    stage_fn: Callable[[Any, Array], Array],
    axis_name: str,
):
    """Per-device body. stacked_params leaves have a leading size-1 stage
    axis (this device's stage); microbatches [M, mb, ...] are replicated."""
    s = lax.axis_index(axis_name)
    S = lax.axis_size(axis_name)
    M = microbatches.shape[0]
    params_local = jax.tree_util.tree_map(lambda x: x[0], stacked_params)

    zero_act = lax.pcast(
        jnp.zeros_like(microbatches[0]), (axis_name,), to="varying"
    )

    def tick(carry, t):
        act_in_flight = carry
        # stage 0 ingests microbatch t (clamped; masked out beyond M)
        mb_idx = jnp.clip(t, 0, M - 1)
        fresh = lax.dynamic_index_in_dim(microbatches, mb_idx, 0, keepdims=False)
        fresh = lax.pcast(fresh, (axis_name,), to="varying")
        x = jnp.where(s == 0, fresh, act_in_flight)
        y = stage_fn(params_local, x)
        # ship activations one stage down the ring (last stage's output
        # falls off; stage 0 never reads the carry)
        perm = [(i, i + 1) for i in range(S - 1)]
        nxt = lax.ppermute(y, axis_name, perm)
        return nxt, y

    _, outs = lax.scan(tick, zero_act, jnp.arange(M + S - 1))
    # stage S-1 produced microbatch m at tick m + S - 1; add a stage axis so
    # out_specs P(axis_name) stacks per-stage results as [S, M, mb, ...]
    return outs[S - 1 :][None]  # [1, M, mb, ...]


def pipeline_apply(
    stacked_params: Any,
    x: Array,
    stage_fn: Callable[[Any, Array], Array],
    mesh: Mesh,
    num_microbatches: int,
    axis_name: str = "model",
    data_axis: str = None,
) -> Array:
    """Run x through S = mesh.shape[axis_name] sequential stages.

    stacked_params: pytree whose leaves have leading dim S (one slice per
      stage), sharded over `axis_name`.
    x: [B, ...] with B divisible by num_microbatches.
    stage_fn(params_slice, activation) -> activation, shape-preserving.
    data_axis: optional second mesh axis to shard the microbatch dimension
      over (dp x pp: each data-parallel row runs its own pipeline over the
      stage ring; params replicated across rows, ppermute stays within a
      row because it only permutes along `axis_name`).
    """
    B = x.shape[0]
    assert B % num_microbatches == 0
    mb = B // num_microbatches
    micro = x.reshape(num_microbatches, mb, *x.shape[1:])

    param_specs = jax.tree_util.tree_map(
        lambda _: P(axis_name), stacked_params
    )
    micro_spec = P(None, data_axis) if data_axis else P()
    out_spec = (
        P(axis_name, None, data_axis) if data_axis else P(axis_name)
    )  # [S, M, mb, ...]; row S-1 holds the result
    fn = shard_map(
        functools.partial(
            _pipeline_local, stage_fn=stage_fn, axis_name=axis_name
        ),
        mesh=mesh,
        in_specs=(param_specs, micro_spec),
        out_specs=out_spec,
        check_vma=False,
    )
    outs = fn(stacked_params, micro)
    result = outs[-1]  # last stage's outputs
    return result.reshape(B, *x.shape[1:])


def stack_layer_params(params: Any, num_layers: int, num_stages: int):
    """Group the model's `layer_{i}` param subtrees into pipeline stages.

    Returns ``(stacked, layer_idx, valid)``:
      stacked:   pytree, leaves [num_stages, lps_max, ...]
      layer_idx: int32 [num_stages, lps_max] — global layer index per slot
                 (drives the per-layer chaos PRNG fold_in)
      valid:     bool [num_stages, lps_max] — False for padded slots

    Uneven num_layers/num_stages is supported by front-loading (6 layers
    over 4 stages -> sizes [2, 2, 1, 1]) and padding short stages to
    lps_max with layer_0's params; padded slots must be masked by the
    caller's stage_fn (``x = where(valid[j], layer(x), x)``). This is the
    bridge from SmokePhysNet's per-layer tree (models/net.py) to
    `pipeline_apply`'s stacked input."""
    lps_max = -(-num_layers // num_stages)
    base, rem = divmod(num_layers, num_stages)
    stages, idx_rows, valid_rows = [], [], []
    off = 0
    for s in range(num_stages):
        size = base + (1 if s < rem else 0)
        ids = list(range(off, off + size))
        off += size
        pad = lps_max - size
        idx_rows.append(ids + [0] * pad)
        valid_rows.append([True] * size + [False] * pad)
        group = [params[f"layer_{i}"] for i in ids] + [params["layer_0"]] * pad
        stages.append(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *group))
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)
    return (
        stacked,
        jnp.asarray(idx_rows, jnp.int32),
        jnp.asarray(valid_rows),
    )
