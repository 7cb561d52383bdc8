"""YAML config loading with the reference's schema
(reference config/config.yaml:1-37, loaded via yaml.safe_load in
train.py:19-23). Adds a defaults layer the reference lacks (plain dict
indexing there), so partial configs and new TPU-specific keys degrade
gracefully."""
from __future__ import annotations

import copy
from typing import Any, Dict

import yaml

DEFAULTS: Dict[str, Any] = {
    "data": {
        "grid_size": [128, 128],
        "sequence_length": 20,
        "num_train": 800,
        "num_val": 200,
        "cache_dir": "./cache",
    },
    "model": {
        "input_dim": 128,
        "hidden_dim": 512,
        "num_layers": 6,
        "num_heads": 8,
        "output_channels": 64,
        "chaos_strength": 0.1,
    },
    "physics": {
        "conservation_weight": 1.0,
        "continuity_weight": 1.0,
        "energy_weight": 0.5,
    },
    "training": {
        "batch_size": 8,
        "num_epochs": 100,
        "learning_rate": 0.001,
        "weight_decay": 0.01,
        # opt-in EMA of params (no reference analog); 0 = off. When set
        # (e.g. 0.999), validation/checkpointing use the EMA weights.
        "ema_decay": 0.0,
    },
    "simulation": {
        "dt": 0.01,
        "viscosity": 0.001,
        "grid_size": [128, 128],
        "num_jacobi_iters": 20,  # reference hardcodes 20 (navier_stokes.py:139)
    },
    # TPU-native extensions (absent in the reference schema)
    "tpu": {
        "use_pallas": True,
        "seed": 0,
        "data_axis": 1,       # data-parallel mesh extent (1 = single chip)
        "model_axis": 1,      # tensor-parallel mesh extent
        "vorticity_eps": 0.0,
        "compute_dtype": "float32",  # 'bfloat16' = MXU fast path for serving
        "train_compute_dtype": "float32",  # 'bfloat16' = mixed-precision
        # training: bf16 matmul/conv compute, f32 master params + optimizer
        # state + loss (params are stored f32 and cast at use, layers.py)
        "fused_epoch": False,  # run each train epoch (and val pass) as ONE
        # jitted lax.scan over the on-device dataset — removes the ~30 ms/step
        # tunnel dispatch floor (train/loop.py make_train_epoch). Single-chip
        # + device-resident datasets only; otherwise falls back to the loop.
        # Composes with training.ema_decay (the EMA carry rides in the scan).
        "train_rng": "threefry",  # PRNG impl for the per-step training
        # streams (dropout masks, chaos keys, input noise): 'threefry'
        # (parity default — same streams as every committed checkpoint) or
        # 'rbg' (XLA RngBitGenerator; TPU-native bit generation). Measured
        # on v5e at batch 8: threefry dropout costs 7.8 ms of the 25 ms
        # bf16 step (2.7 fwd + 5.1 bwd — XLA rematerialises the masks in
        # the backward pass); 'rbg' recovers 6.8 ms (probe_train_hotspots).
        # Param INIT always stays threefry so initial weights match the
        # reference port regardless of this setting.
        "use_flash": False,   # Pallas flash attention on the serving path
        "fast_math": False,   # bf16 residual stream in the trunk (serving)
        "fast_encoder": False,  # pool oversize frames to input_dim^2 BEFORE
        # the conv encoder (streaming fast path; documented divergence)
        "sp_impl": "ring",    # sequence parallelism: 'ring' | 'ulysses'
        "ring_axis": None,    # mesh axis for ring attention (e.g. 'space')
        "pipeline_axis": None,  # mesh axis for pipeline-parallel trunk
    },
}


def _merge(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in (override or {}).items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def load_config(config_path: str | None = None) -> Dict[str, Any]:
    """Load YAML config merged over defaults (reference train.py:19-23)."""
    if config_path is None:
        return copy.deepcopy(DEFAULTS)
    with open(config_path) as f:
        user = yaml.safe_load(f) or {}
    return _merge(DEFAULTS, user)


def apply_overrides(config: Dict[str, Any], overrides: list[str]) -> Dict[str, Any]:
    """Apply `section.key=value` CLI overrides in place. Values are parsed
    with yaml.safe_load so `false`, `0.001`, `[128,128]` all get the right
    type. Dotted paths create intermediate dicts as needed."""
    for item in overrides:
        path, _, raw = item.partition("=")
        if not _:
            raise ValueError(f"override {item!r} is not of the form a.b=val")
        keys = path.strip().split(".")
        node = config
        for k in keys[:-1]:
            node = node.setdefault(k, {})
        node[keys[-1]] = yaml.safe_load(raw)
    return config
