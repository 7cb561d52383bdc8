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
) -> Array:
    """Run x through S = mesh.shape[axis_name] sequential stages.

    stacked_params: pytree whose leaves have leading dim S (one slice per
      stage), sharded over `axis_name`.
    x: [B, ...] with B divisible by num_microbatches.
    stage_fn(params_slice, activation) -> activation, shape-preserving.
    """
    B = x.shape[0]
    assert B % num_microbatches == 0
    mb = B // num_microbatches
    micro = x.reshape(num_microbatches, mb, *x.shape[1:])

    param_specs = jax.tree_util.tree_map(
        lambda _: P(axis_name), stacked_params
    )
    fn = shard_map(
        functools.partial(
            _pipeline_local, stage_fn=stage_fn, axis_name=axis_name
        ),
        mesh=mesh,
        in_specs=(param_specs, P()),
        out_specs=P(axis_name),  # [S, M, mb, ...]; row S-1 holds the result
        check_vma=False,
    )
    outs = fn(stacked_params, micro)
    result = outs[-1]  # last stage's outputs
    return result.reshape(B, *x.shape[1:])


def stack_layer_params(params: Any, num_layers: int, num_stages: int) -> Any:
    """Group the model's `layer_{i}` param subtrees into pipeline stages:
    leaves become [num_stages, layers_per_stage, ...] with stage s holding
    layers [s*lps, (s+1)*lps). This is the bridge from SmokePhysNet's
    per-layer tree (models/net.py) to `pipeline_apply`'s stacked input."""
    assert num_layers % num_stages == 0, (num_layers, num_stages)
    lps = num_layers // num_stages
    stages = []
    for s in range(num_stages):
        group = [params[f"layer_{s * lps + j}"] for j in range(lps)]
        stages.append(jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *group))
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *stages)
