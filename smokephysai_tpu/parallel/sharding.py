"""Sharding rules: how SmokePhysNet parameters and batches map onto the
mesh.

Tensor-parallel layout for the chaos transformer (new; reference is
single-device, SURVEY.md §2.6):
  * q/k/v projections + chaos_proj: columns (head dim) over 'model'
  * out_proj + ffn_out: rows over 'model' (the contraction that triggers
    the compiler-inserted psum over ICI)
  * ffn_in: columns over 'model'
  * everything else (convs, norms, heads, pos-emb): replicated
Batches shard their leading dim over 'data'. XLA/GSPMD inserts the gradient
all-reduce and TP collectives; we only annotate.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# param-name -> PartitionSpec for the kernel; biases follow the output axis
_COL_SHARDED = {"q_proj", "k_proj", "v_proj", "chaos_proj", "ffn_in"}
_ROW_SHARDED = {"out_proj", "ffn_out"}


def _spec_for(path: tuple, leaf) -> P:
    names = [getattr(p, "key", str(p)) for p in path]
    owner = names[-2] if len(names) >= 2 else ""
    leaf_name = names[-1]
    if owner in _COL_SHARDED:
        if leaf_name == "kernel":
            return P(None, "model")
        if leaf_name == "bias":
            return P("model")
    if owner in _ROW_SHARDED:
        if leaf_name == "kernel":
            return P("model", None)
        if leaf_name == "bias":
            return P()  # row-parallel bias is replicated (added post-psum)
    return P()  # replicate


def param_sharding_specs(params: Any) -> Any:
    """PartitionSpec pytree matching `params`."""
    return jax.tree_util.tree_map_with_path(_spec_for, params)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put params with TP specs over `mesh`."""
    specs = param_sharding_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def shard_train_state(state: Any, mesh: Mesh) -> Any:
    """device_put an entire TrainState onto `mesh`: params get TP specs,
    optimizer moments (mu/nu mirror the param tree, so `_spec_for`'s
    last-two-path-names rule matches them identically) get the SAME specs —
    a per-chip memory win under TP — and scalars/batch_stats replicate.

    Needed for sharded checkpoint restore: orbax restores every leaf with
    the template's committed sharding, and a template with mesh-committed
    params but single-device-committed opt_state/step is rejected by jit
    ('incompatible devices'). Mapping the whole state through one mesh
    keeps every leaf consistent."""
    specs = jax.tree_util.tree_map_with_path(_spec_for, state)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), state, specs
    )


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim data sharding for batch arrays."""
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
