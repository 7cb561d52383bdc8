"""Port a reference PyTorch `SmokePhysNet` state_dict into this package's
Flax variable tree.

The reference model (reference src/models/smokephys_net.py:10-76) and the
Flax `SmokePhysNet` (models/net.py) are the same mathematical function; this
module is the bridge that *proves* it: convert the torch weights, run both
forwards on the same input with the same chaos fields, and the outputs match
element-wise (tests/test_torch_port.py).

Layout rules applied per layer kind:
  * nn.Linear weight [out, in]        -> Dense kernel [in, out]       (transpose)
  * nn.Conv2d weight [O, I, kh, kw]   -> HWIO kernel [kh, kw, I, O]
  * nn.ConvTranspose2d [I, O, kh, kw] -> kept verbatim (layers.py stores the
    torch layout and flips inside ops/image.conv_transpose_2x)
  * nn.BatchNorm2d weight/bias        -> scale/bias params; running_mean/var
    -> batch_stats mean/var
  * nn.LayerNorm weight/bias          -> scale/bias
  * Lorenz sigma/rho/beta buffers and num_batches_tracked are constants in
    this implementation (chaos_attention.py:33-36) and are dropped.

Operates on plain {str: np.ndarray} so the package never imports torch; the
torch state_dict is materialised to numpy by scripts/make_goldens.py (or any
caller that does `{k: v.numpy() for k, v in sd.items()}`).
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

# torch prefix -> (flax path, kind)
_ENCODER = {
    "input_encoder.0": (("enc_conv1",), "conv"),
    "input_encoder.1": (("enc_bn1",), "bn"),
    "input_encoder.3": (("enc_conv2",), "conv"),
    "input_encoder.4": (("enc_bn2",), "bn"),
    "feature_proj": (("feature_proj",), "linear"),
    "output_decoder.0": (("dec1",), "linear"),
    "output_decoder.2": (("dec2",), "linear"),
    "reconstruction_head.0": (("up1",), "convT"),
    "reconstruction_head.1": (("up_bn1",), "bn"),
    "reconstruction_head.3": (("up2",), "convT"),
    "reconstruction_head.4": (("up_bn2",), "bn"),
    "reconstruction_head.6": (("recon_out",), "conv"),
    "physics_head.0": (("phys1",), "linear"),
    "physics_head.2": (("phys2",), "linear"),
}

_ATTN_LEAVES = ("q_proj", "k_proj", "v_proj", "out_proj", "chaos_proj", "chaos_gate")


def _layer_map(num_layers: int) -> Dict[str, Tuple[Tuple[str, ...], str]]:
    m: Dict[str, Tuple[Tuple[str, ...], str]] = {}
    for i in range(num_layers):
        t = f"chaos_layers.{i}"
        f = f"layer_{i}"
        for leaf in _ATTN_LEAVES:
            m[f"{t}.chaos_attention.{leaf}"] = ((f, "chaos_attention", leaf), "linear")
        m[f"{t}.norm1"] = ((f, "norm1"), "ln")
        m[f"{t}.norm2"] = ((f, "norm2"), "ln")
        m[f"{t}.ffn.0"] = ((f, "ffn_in"), "linear")
        m[f"{t}.ffn.3"] = ((f, "ffn_out"), "linear")
    return m


def _set(tree: Dict, path: Tuple[str, ...], leaf: str, value: np.ndarray) -> None:
    node = tree
    for p in path:
        node = node.setdefault(p, {})
    node[leaf] = np.asarray(value, np.float32)


def convert_torch_state_dict(
    state: Dict[str, np.ndarray], num_layers: int = 6
) -> Dict[str, Dict]:
    """{torch key: np array} -> {"params": ..., "batch_stats": ...} matching
    models/net.SmokePhysNet's variable tree."""
    table = dict(_ENCODER)
    table.update(_layer_map(num_layers))

    params: Dict = {}
    stats: Dict = {}
    consumed = set()

    params["pos_embedding"] = np.asarray(state["pos_embedding"], np.float32)
    consumed.add("pos_embedding")

    for prefix, (path, kind) in table.items():
        w = state[f"{prefix}.weight"]
        consumed.add(f"{prefix}.weight")
        if kind == "linear":
            _set(params, path, "kernel", np.transpose(w))
            _set(params, path, "bias", state[f"{prefix}.bias"])
            consumed.add(f"{prefix}.bias")
        elif kind == "conv":
            _set(params, path, "kernel", np.transpose(w, (2, 3, 1, 0)))
            _set(params, path, "bias", state[f"{prefix}.bias"])
            consumed.add(f"{prefix}.bias")
        elif kind == "convT":
            _set(params, path, "weight", w)
            _set(params, path, "bias", state[f"{prefix}.bias"])
            consumed.add(f"{prefix}.bias")
        elif kind == "ln":
            _set(params, path, "scale", w)
            _set(params, path, "bias", state[f"{prefix}.bias"])
            consumed.add(f"{prefix}.bias")
        elif kind == "bn":
            bn_path = path + ("BatchNorm_0",)
            _set(params, bn_path, "scale", w)
            _set(params, bn_path, "bias", state[f"{prefix}.bias"])
            _set(stats, bn_path, "mean", state[f"{prefix}.running_mean"])
            _set(stats, bn_path, "var", state[f"{prefix}.running_var"])
            consumed.update(
                f"{prefix}.{s}" for s in ("bias", "running_mean", "running_var")
            )

    leftovers = [
        k
        for k in state
        if k not in consumed
        and "num_batches_tracked" not in k
        and "lorenz_" not in k
        and "physics_regularizer" not in k
    ]
    if leftovers:
        raise ValueError(f"unmapped torch keys: {leftovers}")
    return {"params": params, "batch_stats": stats}


def export_torch_state_dict(
    variables: Dict[str, Dict], num_layers: int = 6
) -> Dict[str, np.ndarray]:
    """Inverse of `convert_torch_state_dict`: Flax {params, batch_stats} ->
    {torch key: np array}. Used to cross-validate checkpoints trained here
    against the reference torch implementation (scripts/crossval_reference.py)."""
    table = dict(_ENCODER)
    table.update(_layer_map(num_layers))
    params, stats = variables["params"], variables["batch_stats"]

    def get(tree: Dict, path: Tuple[str, ...], leaf: str) -> np.ndarray:
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node[leaf], np.float32)

    out: Dict[str, np.ndarray] = {
        "pos_embedding": np.asarray(params["pos_embedding"], np.float32)
    }
    for prefix, (path, kind) in table.items():
        if kind == "linear":
            out[f"{prefix}.weight"] = np.transpose(get(params, path, "kernel"))
            out[f"{prefix}.bias"] = get(params, path, "bias")
        elif kind == "conv":
            out[f"{prefix}.weight"] = np.transpose(
                get(params, path, "kernel"), (3, 2, 0, 1)
            )
            out[f"{prefix}.bias"] = get(params, path, "bias")
        elif kind == "convT":
            out[f"{prefix}.weight"] = get(params, path, "weight")
            out[f"{prefix}.bias"] = get(params, path, "bias")
        elif kind == "ln":
            out[f"{prefix}.weight"] = get(params, path, "scale")
            out[f"{prefix}.bias"] = get(params, path, "bias")
        elif kind == "bn":
            bn_path = path + ("BatchNorm_0",)
            out[f"{prefix}.weight"] = get(params, bn_path, "scale")
            out[f"{prefix}.bias"] = get(params, bn_path, "bias")
            out[f"{prefix}.running_mean"] = get(stats, bn_path, "mean")
            out[f"{prefix}.running_var"] = get(stats, bn_path, "var")
    return out


def synth_torch_state(
    keys_and_shapes: Dict[str, Tuple[int, ...]], seed: int = 0, num_layers: int = 6
) -> Dict[str, np.ndarray]:
    """Deterministically synthesize a torch-layout state dict with
    realistically-scaled values (torch-default uniform(+-1/sqrt(fan)) weights,
    positive running_var). Both scripts/make_goldens.py (feeding the torch
    reference) and tests/test_torch_port.py (feeding the converter) call this
    with the same seed, so the full ~28M-param state never needs committing —
    only the (key, shape) metadata and the recorded torch outputs do."""
    table = dict(_ENCODER)
    table.update(_layer_map(num_layers))
    kind_of = {prefix: kind for prefix, (path, kind) in table.items()}
    rng = np.random.default_rng(seed)
    state: Dict[str, np.ndarray] = {}
    for key in sorted(keys_and_shapes):
        shape = tuple(keys_and_shapes[key])
        if key.endswith(".running_var"):
            state[key] = rng.uniform(0.5, 1.5, shape).astype(np.float32)
        elif key.endswith(".running_mean"):
            state[key] = (0.2 * rng.standard_normal(shape)).astype(np.float32)
        elif key == "pos_embedding":
            state[key] = rng.standard_normal(shape).astype(np.float32)
        else:
            prefix = key.rsplit(".", 1)[0]
            kind = kind_of.get(prefix, "ln")
            if kind in ("ln", "bn"):
                if key.endswith(".weight"):
                    value = 1.0 + 0.1 * rng.standard_normal(shape)
                else:
                    value = 0.05 * rng.standard_normal(shape)
            else:
                w_shape = tuple(keys_and_shapes[f"{prefix}.weight"])
                if kind == "linear":
                    fan = w_shape[1]
                elif kind == "conv":
                    fan = w_shape[1] * w_shape[2] * w_shape[3]
                else:  # convT: torch fan = C_out * kh * kw
                    fan = w_shape[1] * w_shape[2] * w_shape[3]
                bound = fan**-0.5
                value = rng.uniform(-bound, bound, shape)
            state[key] = value.astype(np.float32)
    return state
