"""Orbax checkpointing: {params, batch_stats, opt_state, epoch, val_loss,
config} with a working resume path.

The reference saves a best-val torch dict (train.py:268-277) and parses a
--resume flag it never uses (train.py:186-187; SURVEY.md §5). Here resume is
real: `restore_checkpoint` rebuilds the exact TrainState pytree.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import orbax.checkpoint as ocp

CKPT_NAME = "best_model"
LAST_NAME = "last_model"
META_NAME = "meta.json"


def save_checkpoint(
    exp_dir: str, state, meta: Dict[str, Any], name: str = CKPT_NAME
) -> str:
    """Save TrainState arrays + JSON metadata under exp_dir/<name>.

    `name=CKPT_NAME` is the best-val checkpoint (reference train.py:268-277
    semantics); fit() additionally writes `name=LAST_NAME` at the end of
    training — a phase-1 run of the two-phase recipe must hand its FINAL
    state (not the noisy-val best) to the phase-2 --init_from."""
    path = os.path.abspath(os.path.join(exp_dir, name))
    ckptr = ocp.StandardCheckpointer()
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": state.epoch,
    }
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    meta_name = META_NAME if name == CKPT_NAME else f"{name}_meta.json"
    with open(os.path.join(exp_dir, meta_name), "w") as f:
        json.dump(meta, f, indent=2, default=str)
    return path


def restore_checkpoint(path: str, state) -> Tuple[Any, Dict[str, Any]]:
    """Restore into a template TrainState (created with the same config).
    `path` is either the checkpoint dir itself or the experiment dir
    containing best_model/."""
    path = os.path.abspath(path)
    if os.path.isdir(os.path.join(path, CKPT_NAME)):
        exp_dir = path
        path = os.path.join(path, CKPT_NAME)
    else:
        exp_dir = os.path.dirname(path)

    ckptr = ocp.StandardCheckpointer()
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
        "epoch": state.epoch,
    }
    restored = ckptr.restore(path, template)
    state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
        epoch=restored["epoch"],
    )

    # Match save_checkpoint's naming: best_model pairs with meta.json,
    # any other name (e.g. last_model) pairs with <name>_meta.json. Without
    # this, resuming from last_model would silently read best_model's meta
    # (wrong epoch/val_loss) and re-run already-completed epochs.
    name = os.path.basename(path)
    meta_name = META_NAME if name == CKPT_NAME else f"{name}_meta.json"
    meta: Dict[str, Any] = {}
    for candidate in (meta_name, META_NAME):
        meta_path = os.path.join(exp_dir, candidate)
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            break
    return state, meta


def latest_checkpoint(experiments_root: str = "experiments") -> Optional[str]:
    """Most recent experiment dir containing a checkpoint."""
    if not os.path.isdir(experiments_root):
        return None
    candidates = sorted(
        d
        for d in os.listdir(experiments_root)
        if os.path.isdir(os.path.join(experiments_root, d, CKPT_NAME))
    )
    if not candidates:
        return None
    return os.path.join(experiments_root, candidates[-1])
