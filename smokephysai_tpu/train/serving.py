"""Inference-side model loading and a fused predict function.

The reference reloads the torch checkpoint and runs batch-1 eager forwards
per frame — the 610.92 ms/frame hot path (reference inference.py:52-73,
SURVEY.md §3.2). Here loading returns a jitted batched predictor with a
fixed chaos key (deterministic eval, SURVEY.md §7 nondeterminism policy);
frames never leave the device between simulation and model.
"""
from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp

from smokephysai_tpu.models import SmokePhysNet

Array = jnp.ndarray


def build_model(
    config: Dict, bn_axis_name: str | None = None, mesh=None
) -> SmokePhysNet:
    """Model from config. `tpu.use_flash` routes attention through the
    Pallas flash kernel (inference path); `tpu.ring_axis` + a mesh with a
    >1 extent on that axis enables ring attention (sequence parallelism)."""
    mc = config["model"]
    tpu_cfg = config.get("tpu", {})
    dtype = jnp.dtype(tpu_cfg.get("compute_dtype", "float32"))
    if len(config.get("data", {}).get("grid_size", (0, 0))) == 3:
        # volumetric config (BASELINE configs[3]) -> SmokePhysNet3D; the 2D
        # SP/pipeline knobs don't apply to the 512-token volume trunk
        from smokephysai_tpu.models.net3d import SmokePhysNet3D

        return SmokePhysNet3D(
            hidden_dim=mc["hidden_dim"],
            num_layers=mc["num_layers"],
            num_heads=mc["num_heads"],
            output_channels=mc.get("output_channels", 32),
            chaos_strength=mc["chaos_strength"],
            bn_axis_name=bn_axis_name,
            dtype=dtype,
            use_flash=tpu_cfg.get("use_flash", False),
            fast_math=tpu_cfg.get("fast_math", False),
        )
    ring_axis = tpu_cfg.get("ring_axis")
    if ring_axis is not None and (mesh is None or mesh.shape[ring_axis] == 1):
        ring_axis = None  # ring over a size-1 axis is just full attention
    return SmokePhysNet(
        input_dim=mc["input_dim"],
        hidden_dim=mc["hidden_dim"],
        num_layers=mc["num_layers"],
        num_heads=mc["num_heads"],
        output_channels=mc.get("output_channels", 64),
        chaos_strength=mc["chaos_strength"],
        bn_axis_name=bn_axis_name,
        dtype=dtype,
        use_flash=tpu_cfg.get("use_flash", False),
        fast_math=tpu_cfg.get("fast_math", False),
        fast_encoder=tpu_cfg.get("fast_encoder", False),
        ring_axis=ring_axis,
        ring_mesh=mesh if ring_axis is not None else None,
        sp_impl=tpu_cfg.get("sp_impl", "ring"),
    )


def _load_npz_variables(path: str) -> Dict:
    """Load a flat npz export (scripts/export_checkpoint.py) back into the
    {params, batch_stats} pytree. Keys look like
    params/['layer_0']['chaos_attention']['q_proj']['kernel']."""
    import re

    import numpy as np

    out: Dict = {"params": {}, "batch_stats": {}}
    with np.load(path) as f:
        for key in f.files:
            col, rest = key.split("/", 1)
            parts = re.findall(r"\['([^']+)'\]", rest)
            node = out[col]
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jnp.asarray(f[key])
    return out


def load_model(
    config: Dict, checkpoint_path: str
) -> Tuple[SmokePhysNet, Dict]:
    """Restore {params, batch_stats} from an Orbax checkpoint dir or a flat
    .npz export (counterpart of reference inference.py:20-33)."""
    model = build_model(config)
    if checkpoint_path.endswith(".npz"):
        return model, _load_npz_variables(checkpoint_path)

    from .checkpoint import restore_checkpoint
    from .loop import create_train_state

    template = create_train_state(config, jax.random.PRNGKey(0), 1)
    state, _ = restore_checkpoint(checkpoint_path, template)
    return model, {"params": state.params, "batch_stats": state.batch_stats}


def make_predictor(
    model: SmokePhysNet, variables: Dict, chaos_seed: int = 0,
    auto_layout: bool = False,
) -> Callable[[Array], Dict[str, Array]]:
    """Jitted batched forward with a fixed chaos key. Input NHWC
    [B, H, W, 1] -> dict {reconstructed, physics_features, latent_features}.

    `variables` rides as a jit ARGUMENT (zero-copy device buffers), not a
    closure constant — closed-over params are embedded in the StableHLO
    module as literals (111 MB for the flagship net), which a remote
    compile service must ingest per program. The wrapper exposes
    ``predict.jitted`` / ``predict.variables`` so gradient-based callers
    (eval/perturbation.py PGD) can thread the params through their own
    traces the same way.

    `auto_layout=True` AOT-compiles at the FIRST call's batch shape with
    compiler-chosen (Layout.AUTO) weight layouts and device_puts the
    variables once into the compiled program's preferred formats — a
    closure-constant program gets free layout choice for its weight
    literals, and this recovers that freedom for the arguments-style
    construction without the literal-stuffed module. Calls at other batch
    shapes fall back to the default jit path."""
    key = jax.random.PRNGKey(chaos_seed)

    @jax.jit
    def predict_v(variables: Dict, x: Array) -> Dict[str, Array]:
        return model.apply(variables, x, train=False, rngs={"chaos": key})

    if auto_layout:
        from jax.experimental.layout import Format, Layout

        aot = {}  # x.shape -> (compiled, vs_in_preferred_layout)

        def predict(x: Array) -> Dict[str, Array]:
            entry = aot.get(x.shape)
            if entry is None:
                try:
                    auto = Format(Layout.AUTO)
                    jf = jax.jit(
                        lambda v, xx: model.apply(
                            v, xx, train=False, rngs={"chaos": key}
                        ),
                        in_shardings=(auto, auto),
                    )
                    compiled = jf.lower(variables, x).compile()
                    (vs_fmt, x_fmt), _ = compiled.input_formats
                    entry = (compiled, jax.device_put(variables, vs_fmt), x_fmt)
                except Exception:
                    entry = None  # layout API unavailable: plain path
                aot[x.shape] = entry if entry is not None else False
            if not entry:
                return predict_v(variables, x)
            compiled, vs_opt, x_fmt = entry
            return compiled(vs_opt, jax.device_put(x, x_fmt))

    else:

        def predict(x: Array) -> Dict[str, Array]:
            return predict_v(variables, x)

    predict.jitted = predict_v
    predict.variables = variables
    return predict


def make_chunked_predictor(
    predict: Callable[[Array], Dict[str, Array]], chunk_size: int
) -> Callable[[Array], Dict[str, Array]]:
    """Wrap a jitted predictor to run the batch in fixed-size chunks and
    concatenate the output dict on the host.

    Needed for the volumetric (128^3) evaluation protocol: one 50-volume
    predict batch materialises ~27 GB of encoder activations
    (net3d.py enc_conv2), past a v5e's 16 GB HBM — so inference-only
    report sections run chunk-at-a-time. Tail chunks are padded by
    repeating the last sample (keeps `predict`'s jitted shape static) and
    the padding is dropped from the outputs. Gradient-based tests (PGD)
    must NOT use this wrapper — jax.grad cannot flow through the host
    concatenation; PerturbationTester.adversarial_test chunks internally
    instead.

    Note on determinism: samples never couple through each other's data,
    but the fixed-key chaos field is drawn at the BATCH shape, so chunked
    results are a different (equally valid, still deterministic) draw than
    one full-batch call; they are bit-identical when chaos_strength=0
    (tests/test_eval.py::TestChunkedPredictor)."""
    import numpy as np

    def predict_chunked(x: Array) -> Dict[str, Array]:
        n = x.shape[0]
        if n <= chunk_size:
            return predict(x)
        outs = []
        for s in range(0, n, chunk_size):
            blk = x[s : s + chunk_size]
            real = blk.shape[0]
            if real < chunk_size:
                blk = jnp.concatenate(
                    [blk, jnp.repeat(blk[-1:], chunk_size - real, axis=0)], 0
                )
            o = predict(blk)
            outs.append({k: np.asarray(v[:real]) for k, v in o.items()})
        return {
            k: jnp.asarray(np.concatenate([o[k] for o in outs], axis=0))
            for k in outs[0]
        }

    return predict_chunked


def make_pipelined_predictor(
    model: SmokePhysNet,
    variables: Dict,
    mesh,
    axis_name: str = "model",
    num_microbatches: int | None = None,
    chaos_seed: int = 0,
    data_axis: str | None = None,
) -> Callable[[Array], Dict[str, Array]]:
    """Pipeline-parallel serving (config key `tpu.pipeline_axis`): the six
    ChaosTransformerLayers run as GPipe stages over `axis_name` —
    mesh.shape[axis_name] stages of num_layers/stages layers each, with
    microbatched activations flowing stage-to-stage over ICI
    (parallel/pipeline.py). Encoder/decoder run replicated.

    Chaos PRNG divergence (documented): stage keys are derived from the
    global layer index and shared across microbatches, so the Lorenz init
    is per-microbatch rather than per-batch. Same semantics class as the
    reference's fresh-noise-per-forward (chaos_attention.py:50-52)."""
    from smokephysai_tpu.models.net import ChaosTransformerLayer
    from smokephysai_tpu.parallel.pipeline import (
        pipeline_apply,
        stack_layer_params,
    )

    num_stages = mesh.shape[axis_name]
    lps_max = -(-model.num_layers // num_stages)
    stacked = stack_layer_params(
        variables["params"], model.num_layers, num_stages
    )  # (params [S, lps_max, ...], layer_idx, valid) — uneven stages padded
    layer_module = ChaosTransformerLayer(
        model.hidden_dim, model.num_heads, model.chaos_strength,
        dtype=model.dtype, fast_math=model.fast_math,
        use_flash=model.use_flash,
    )
    base_key = jax.random.PRNGKey(chaos_seed)

    def stage_fn(stage_params, x):
        p_stage, layer_idx, valid = stage_params
        for j in range(lps_max):
            p_j = jax.tree_util.tree_map(lambda t: t[j], p_stage)
            k_j = jax.random.fold_in(base_key, layer_idx[j])
            y = layer_module.apply({"params": p_j}, x, True, k_j)
            x = jnp.where(valid[j], y, x)  # padded slot: pass through
        return x

    @jax.jit
    def predict_v(variables: Dict, stacked, x: Array) -> Dict[str, Array]:
        # params ride as jit arguments, not closure constants — see
        # make_predictor. microbatch count must divide the (trace-time
        # static) batch; more microbatches -> less pipeline bubble, so
        # default to the largest divisor of B up to num_stages (with
        # dp x pp, each microbatch is additionally split over data_axis,
        # so B/M must divide by its size)
        dsize = mesh.shape[data_axis] if data_axis else 1
        valid_m = [
            m for m in range(1, num_stages + 1)
            if x.shape[0] % m == 0 and (x.shape[0] // m) % dsize == 0
        ]
        if not valid_m:
            raise ValueError(
                f"batch {x.shape[0]} admits no microbatch count m in "
                f"1..{num_stages} with (batch/m) divisible by "
                f"{data_axis}={dsize}; pad the batch or pass "
                f"num_microbatches explicitly"
            )
        M = num_microbatches or max(valid_m)
        feats = model.apply(variables, x, False, method="encode")
        feats = pipeline_apply(
            stacked, feats, stage_fn, mesh, M, axis_name,
            data_axis=data_axis,
        )
        return model.apply(
            variables, feats, (x.shape[1], x.shape[2]), False, False,
            method="decode",
        )

    return lambda x: predict_v(variables, stacked, x)
