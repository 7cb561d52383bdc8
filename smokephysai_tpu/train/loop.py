"""Training loop: jitted train/eval steps + epoch driver.

Re-design of reference train.py:41-280. Same optimisation recipe —
AdamW(lr, wd) with per-epoch cosine annealing (train.py:226-235), global-norm
gradient clipping at 1.0 (train.py:91), loss = recon_mse + 0.1*chaos_mse +
0.05*physics (train.py:69-85) — but as one donated, jitted XLA program per
step instead of an eager loop, with TensorBoard scalars at the reference's
cadence and a *working* resume (the reference parses --resume but never uses
it, train.py:186-187).
"""
from __future__ import annotations

import functools
import math
import time
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from smokephysai_tpu.models import SmokePhysNet
from smokephysai_tpu.models.regularizer import physics_losses

Array = jnp.ndarray

# loss weights from reference train.py:85
CHAOS_LOSS_WEIGHT = 0.1
PHYSICS_LOSS_WEIGHT = 0.05
GRAD_CLIP_NORM = 1.0  # reference train.py:91


@struct.dataclass
class TrainState:
    step: jnp.ndarray
    epoch: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    apply_fn: Callable = struct.field(pytree_node=False)


def cosine_epoch_schedule(
    base_lr: float, num_epochs: int, steps_per_epoch: int,
    schedule_epochs: int | None = None, epoch_offset: int = 0,
) -> optax.Schedule:
    """torch CosineAnnealingLR(T_max=num_epochs) stepped per *epoch*
    (reference train.py:232-235, :254): lr(e) = base*0.5*(1+cos(pi*e/T)).

    `schedule_epochs` decouples the cosine period T from the number of
    epochs actually run, and `epoch_offset` starts partway through it —
    together they let a two-phase run (e.g. bf16 epochs 0-69, then f32
    epochs 70-99 via init_from) follow ONE continuous 100-epoch anneal.
    Config keys: training.schedule_epochs / training.schedule_epoch_offset."""
    T = schedule_epochs or num_epochs

    def schedule(step):
        epoch = jnp.minimum(step // max(steps_per_epoch, 1) + epoch_offset, T)
        return base_lr * 0.5 * (1.0 + jnp.cos(jnp.pi * epoch / T))

    return schedule


def create_train_state(
    config: Dict,
    key: Array,
    steps_per_epoch: int = 100,
    bn_axis_name: str | None = None,
) -> TrainState:
    """Build model + AdamW/cosine/clip optimiser
    (reference train.py:207-235). A 3-element data.grid_size selects the
    volumetric SmokePhysNet3D (BASELINE configs[3]); otherwise the 2D net."""
    mc = config["model"]
    tc = config["training"]
    grid = tuple(config["data"]["grid_size"])
    # Mixed-precision training (tpu.train_compute_dtype: bfloat16): matmuls
    # and convs run at the MXU's bf16 rate (f32 accumulation inside the
    # MXU); params stay f32 master copies (cast at use, layers.py), so the
    # optimizer, gradients and loss are all f32.
    train_dtype = jnp.dtype(
        config.get("tpu", {}).get("train_compute_dtype", "float32")
    )
    # tpu.use_flash now applies to training too: the flash kernel has a
    # Pallas custom VJP (ops/pallas/attention.flash_attention_tokens_trainable).
    # tpu.fast_math (bf16 residual + tanh GELU, documented divergence) is
    # likewise honoured — the bf16+flash+fast_math recipe runs the train
    # step in ~25 ms vs 45 ms for the f32 einsum parity path.
    use_flash = bool(config.get("tpu", {}).get("use_flash", False))
    fast_math = bool(config.get("tpu", {}).get("fast_math", False))
    if len(grid) == 3:
        from smokephysai_tpu.models.net3d import SmokePhysNet3D

        model = SmokePhysNet3D(
            hidden_dim=mc["hidden_dim"],
            num_layers=mc["num_layers"],
            num_heads=mc["num_heads"],
            output_channels=mc.get("output_channels", 32),
            chaos_strength=mc["chaos_strength"],
            bn_axis_name=bn_axis_name,
            dtype=train_dtype,
            use_flash=use_flash,
            fast_math=fast_math,
        )
    else:
        model = SmokePhysNet(
            input_dim=mc["input_dim"],
            hidden_dim=mc["hidden_dim"],
            num_layers=mc["num_layers"],
            num_heads=mc["num_heads"],
            output_channels=mc.get("output_channels", 64),
            chaos_strength=mc["chaos_strength"],
            bn_axis_name=bn_axis_name,
            dtype=train_dtype,
            use_flash=use_flash,
            fast_math=fast_math,
        )
    k_p, k_c = jax.random.split(key)
    variables = model.init(
        {"params": k_p, "chaos": k_c}, jnp.zeros((1, *grid, 1)), train=False
    )
    schedule = cosine_epoch_schedule(
        tc["learning_rate"], tc["num_epochs"], steps_per_epoch,
        tc.get("schedule_epochs"), tc.get("schedule_epoch_offset", 0),
    )
    tx = optax.chain(
        optax.clip_by_global_norm(GRAD_CLIP_NORM),
        optax.adamw(schedule, weight_decay=tc["weight_decay"]),
    )
    return TrainState(
        step=jnp.int32(0),
        epoch=jnp.int32(0),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        opt_state=tx.init(variables["params"]),
        tx=tx,
        apply_fn=model.apply,
    )


def compute_losses(
    outputs: Dict[str, Array], batch: Dict[str, Array], physics_cfg: Dict
) -> Tuple[Array, Dict[str, Array]]:
    """Total loss = recon + 0.1*chaos + 0.05*physics
    (reference train.py:69-85). The physics term feeds only density keys,
    matching what the reference actually wires in (train.py:75-81)."""
    recon_loss = jnp.mean((outputs["reconstructed"] - batch["target"]) ** 2)
    chaos_loss = jnp.mean(
        (outputs["physics_features"] - batch["chaos_features"]) ** 2
    )
    preds = {"density": outputs["reconstructed"]}
    if "sequence" in batch:
        preds["density_sequence"] = batch["sequence"]
    phys = physics_losses(
        preds,
        {"density": batch["target"]},
        conservation_weight=physics_cfg["conservation_weight"],
        continuity_weight=physics_cfg["continuity_weight"],
        energy_weight=physics_cfg["energy_weight"],
        # 3D volumes use per-voxel mean mass (see mass_conservation_loss);
        # 2D keeps the reference's total-mass form for parity
        mass_reduce="mean" if outputs["reconstructed"].ndim == 5 else "sum",
    )
    physics_loss = phys["total_physics_loss"]
    if "sequence" not in batch and "continuity" in batch:
        # host-resident datasets precompute the (param-independent)
        # continuity term per episode instead of shipping full sequences;
        # identical value: mean over [B,T-1,H,W] == mean of per-episode means
        physics_loss = physics_loss + physics_cfg["continuity_weight"] * jnp.mean(
            batch["continuity"]
        )
    total = (
        recon_loss
        + CHAOS_LOSS_WEIGHT * chaos_loss
        + PHYSICS_LOSS_WEIGHT * physics_loss
    )
    return total, {
        "total_loss": total,
        "recon_loss": recon_loss,
        "chaos_loss": chaos_loss,
        "physics_loss": physics_loss,
    }


def _make_step_impl(
    physics_cfg: Dict, noise_std: float = 0.0, rng_impl: str = "threefry"
) -> Callable:
    """Untransformed (state, batch, rng) -> (state, metrics) train step —
    jitted per-batch by make_train_step, scanned whole-epoch by
    make_train_epoch.

    `noise_std` > 0 (training.noise_std) adds Gaussian noise to the INPUT
    frame only (targets/labels untouched) — a denoising augmentation with
    no reference analog (train.py trains clean), opt-in for robustness:
    the r4 3D eval showed feature stability collapsing 0.74 -> 0.29
    between sigma=0.01 and 0.05 on a clean-trained model.

    `rng_impl` (tpu.train_rng): 'rbg' re-wraps the derived step keys as
    XLA RngBitGenerator keys INSIDE the traced step — threefry dropout
    masks cost 7.8 ms of the 25 ms bf16 batch-8 step on v5e (masks are
    rematerialised in the backward), rbg ~1 ms. The incoming `rng` stays a
    plain threefry key, so callers (fit, fused epochs, bench) never run an
    eager rbg op — an eager top-level rbg uniform hung the axon backend."""
    def _convert(k):
        if rng_impl == "threefry":
            return k
        return jax.random.wrap_key_data(
            jax.random.bits(k, (4,), jnp.uint32), impl=rng_impl
        )

    def _step_impl(
        state: TrainState, batch: Dict[str, Array], rng: Array
    ) -> Tuple[TrainState, Dict[str, Array]]:
        k_chaos, k_drop, k_noise = map(_convert, jax.random.split(
            jax.random.fold_in(rng, state.step), 3
        ))
        inp = batch["input"]
        if noise_std > 0.0:
            inp = inp + noise_std * jax.random.normal(
                k_noise, inp.shape, inp.dtype
            )

        def loss_fn(params):
            outputs, mutated = state.apply_fn(
                {"params": params, "batch_stats": state.batch_stats},
                inp,
                train=True,
                rngs={"chaos": k_chaos, "dropout": k_drop},
                mutable=["batch_stats"],
            )
            total, metrics = compute_losses(outputs, batch, physics_cfg)
            return total, (metrics, mutated["batch_stats"])

        grads, (metrics, new_bs) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = state.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, metrics

    return _step_impl


def make_train_step(
    physics_cfg: Dict, ema_decay: float = 0.0, noise_std: float = 0.0,
    rng_impl: str = "threefry",
) -> Callable:
    """Jitted, buffer-donated train step (params/opt-state buffers are
    updated in place in HBM).

    With ema_decay > 0 (training.ema_decay; no reference analog — opt-in
    quality lever) the returned step has the 4-arg signature
    ``(state, ema_params, batch, rng) -> (state, ema_params, metrics)``
    and maintains an exponential moving average of the params inside the
    same XLA program (no extra dispatch). EMA lives outside TrainState so
    every existing 3-arg caller is untouched."""
    _step_impl = _make_step_impl(
        physics_cfg, noise_std=noise_std, rng_impl=rng_impl
    )

    if ema_decay:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step_ema(state, ema_params, batch, rng):
            new_state, metrics = _step_impl(state, batch, rng)
            new_ema = jax.tree_util.tree_map(
                lambda e, p: e + (1.0 - ema_decay) * (p - e),
                ema_params,
                new_state.params,
            )
            return new_state, new_ema, metrics

        return train_step_ema

    return functools.partial(jax.jit, donate_argnums=(0,))(_step_impl)


def _make_eval_impl(physics_cfg: Dict) -> Callable:
    def _eval_impl(
        state: TrainState, batch: Dict[str, Array], rng: Array
    ) -> Dict[str, Array]:
        outputs = state.apply_fn(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["input"],
            train=False,
            rngs={"chaos": rng},
        )
        _, metrics = compute_losses(outputs, batch, physics_cfg)
        return metrics

    return _eval_impl


def make_eval_step(physics_cfg: Dict) -> Callable:
    return jax.jit(_make_eval_impl(physics_cfg))


def make_train_epoch(
    train_ds, physics_cfg: Dict, batch_size: int, ema_decay: float = 0.0,
    noise_std: float = 0.0, rng_impl: str = "threefry",
) -> Callable:
    """Whole-epoch fused training program (``tpu.fused_epoch``).

    The per-batch loop in fit() pays one tunnel dispatch per batch gather
    and per train step — ~20-30 ms each on a remote chip, which floors a
    25 ms bf16 step at ~55 ms wall (400+ dispatches/epoch at 128² batch 8).
    Device-resident datasets don't need any of that: this traces the epoch's
    permutation + frame draws (`epoch_index_arrays`, bit-identical batch
    composition to the loop path), every batch gather (`ds.get_batch`, pure
    jnp on the on-device path) and every train step into ONE jitted
    `lax.scan` — a single dispatch per epoch.

    Returns ``(state, key_epoch) -> (state, metrics)`` with metrics stacked
    per step ([num_batches] leaves), so TB per-50-batch logging survives.
    With ema_decay > 0 the signature gains an ema_params carry, mirroring
    make_train_step's EMA variant. No reference analog (the reference's
    DataLoader is host-side, data_loader.py:134-143); this is the
    jit-the-outer-loop move that XLA's compilation model rewards.

    The dataset's device arrays are threaded through as jit ARGUMENTS
    (zero-copy — they are already committed device buffers). Closing the
    traced epoch over them instead embeds the entire dataset as StableHLO
    literal constants (module bytes ≈ dataset bytes), which stalls remote
    compilation for tens of minutes shipping a multi-GB module."""
    from smokephysai_tpu.data.synthetic import (
        epoch_index_arrays,
        gather_device_batch,
    )

    _step_impl = _make_step_impl(
        physics_cfg, noise_std=noise_std, rng_impl=rng_impl
    )
    n, seq_len = len(train_ds), train_ds.sequence_length
    arrays = train_ds.device_arrays()
    seq_f16 = train_ds._seq_f16

    def _indices(key_epoch):
        return epoch_index_arrays(
            key_epoch, n, batch_size, seq_len, shuffle=True
        )

    def _batch(arrays, ib, fb):
        return gather_device_batch(*arrays, ib, fb, seq_f16)

    if ema_decay:

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_epoch_ema(state, ema_params, key_epoch, arrays):
            def body(carry, ib_fb):
                st, ema = carry
                ib, fb = ib_fb
                st, metrics = _step_impl(
                    st, _batch(arrays, ib, fb), key_epoch
                )
                ema = jax.tree_util.tree_map(
                    lambda e, p: e + (1.0 - ema_decay) * (p - e),
                    ema, st.params,
                )
                return (st, ema), metrics

            (state, ema_params), metrics = jax.lax.scan(
                body, (state, ema_params), _indices(key_epoch)
            )
            return state, ema_params, metrics

        return lambda state, ema_params, key_epoch: train_epoch_ema(
            state, ema_params, key_epoch, arrays
        )

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_epoch(
        state: TrainState, key_epoch: Array, arrays
    ) -> Tuple[TrainState, Dict[str, Array]]:
        def body(st, ib_fb):
            ib, fb = ib_fb
            return _step_impl(st, _batch(arrays, ib, fb), key_epoch)

        return jax.lax.scan(body, state, _indices(key_epoch))

    return lambda state, key_epoch: train_epoch(state, key_epoch, arrays)


def make_train_epoch_staged(
    physics_cfg: Dict, ema_decay: float = 0.0, noise_std: float = 0.0,
    rng_impl: str = "threefry",
) -> Callable:
    """Fused whole-epoch program over HOST-staged batches (the host-path
    counterpart of make_train_epoch, VERDICT r4 weak #6).

    Datasets too big for HBM can't ride the fused on-device epoch, and the
    per-batch host loop pays 3 H2D puts + 1 execute dispatch per batch
    through the tunnel (87 ms/step wall vs the ~51 ms compute floor, r3
    measurement). Instead `SyntheticSmokeDataset.stage_epoch` assembles the
    epoch's [num_batches, B, ...] arrays on host, fit() device_puts them
    ONCE (from a background thread, overlapping the previous epoch), and
    this scans the train step over the leading axis: one dispatch per
    epoch, identical batch composition and numerics to the loop path.

    Both the state and the staged arrays are donated — the staged buffer
    is dead after its epoch and XLA may reuse its pages.

    Returns ``(state, staged, key_epoch) -> (state, metrics)`` (stacked
    [num_batches] metric leaves), or the EMA 4-arg variant."""
    _step_impl = _make_step_impl(
        physics_cfg, noise_std=noise_std, rng_impl=rng_impl
    )

    if ema_decay:

        @functools.partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_epoch_staged_ema(state, ema_params, staged, key_epoch):
            def body(carry, batch):
                st, ema = carry
                st, metrics = _step_impl(st, batch, key_epoch)
                ema = jax.tree_util.tree_map(
                    lambda e, p: e + (1.0 - ema_decay) * (p - e),
                    ema, st.params,
                )
                return (st, ema), metrics

            (state, ema_params), metrics = jax.lax.scan(
                body, (state, ema_params), staged
            )
            return state, ema_params, metrics

        return train_epoch_staged_ema

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_epoch_staged(
        state: TrainState, staged: Dict[str, Array], key_epoch: Array
    ) -> Tuple[TrainState, Dict[str, Array]]:
        def body(st, batch):
            return _step_impl(st, batch, key_epoch)

        return jax.lax.scan(body, state, staged)

    return train_epoch_staged


def make_eval_epoch(val_ds, physics_cfg: Dict, batch_size: int) -> Callable:
    """Fused validation pass: all full batches in one jitted scan
    (in-order, like the per-batch path). The ragged tail batch, if any,
    is the caller's to run eagerly — fit() does, with the same
    `epoch_order_frames` draws, so scores match the loop path exactly.

    Like make_train_epoch, the dataset's device arrays are jit arguments,
    not closure constants (see gather_device_batch)."""
    from smokephysai_tpu.data.synthetic import (
        epoch_index_arrays,
        gather_device_batch,
    )

    _eval_impl = _make_eval_impl(physics_cfg)
    n, seq_len = len(val_ds), val_ds.sequence_length
    arrays = val_ds.device_arrays()
    seq_f16 = val_ds._seq_f16

    @jax.jit
    def eval_epoch(
        state: TrainState, key_eval: Array, arrays
    ) -> Dict[str, Array]:
        idx, fidx = epoch_index_arrays(
            key_eval, n, batch_size, seq_len, shuffle=False
        )

        def body(_, ib_fb):
            ib, fb = ib_fb
            batch = gather_device_batch(*arrays, ib, fb, seq_f16)
            return None, _eval_impl(state, batch, key_eval)

        return jax.lax.scan(body, None, (idx, fidx))[1]

    return lambda state, key_eval: eval_epoch(state, key_eval, arrays)


# convenience single-config entry points
def train_step(state, batch, rng, physics_cfg):
    return make_train_step(physics_cfg)(state, batch, rng)


def eval_step(state, batch, rng, physics_cfg):
    return make_eval_step(physics_cfg)(state, batch, rng)


def fit(
    config: Dict,
    train_ds,
    val_ds,
    exp_dir: str,
    writer=None,
    resume_from: Optional[str] = None,
    init_from: Optional[str] = None,
    log_every: int = 50,  # reference train.py:103
    print_fn: Callable = print,
) -> TrainState:
    """Epoch driver (reference train.py:182-280): train + validate each
    epoch, TB scalars per-50-batches and per-epoch, save best-val
    checkpoint, working resume. `init_from` warm-starts params/batch_stats
    from an npz export with a fresh optimiser (cross-resolution
    fine-tuning)."""
    from .checkpoint import LAST_NAME, restore_checkpoint, save_checkpoint

    tc = config["training"]
    batch_size = tc["batch_size"]
    steps_per_epoch = max(len(train_ds) // batch_size, 1)
    key = jax.random.PRNGKey(config.get("tpu", {}).get("seed", 0))
    key, init_key = jax.random.split(key)
    state = create_train_state(config, init_key, steps_per_epoch)
    # tpu.train_rng='rbg' switches only the per-step streams (dropout/
    # chaos/noise), re-wrapped INSIDE the traced step (_make_step_impl) —
    # every key out here stays threefry: param init reproduces the
    # reference port bit-for-bit and no eager rbg op ever reaches the
    # backend (one hung the axon tunnel, see utils/config.py).
    rng_impl = config.get("tpu", {}).get("train_rng", "threefry")
    if init_from:
        from .serving import _load_npz_variables

        warm = _load_npz_variables(init_from)
        state = state.replace(
            params=warm["params"], batch_stats=warm["batch_stats"]
        )
        print_fn(f"Initialised params from {init_from}")

    # multi-device: DP over 'data', TP over 'model' (config tpu section);
    # GSPMD inserts the gradient all-reduce and TP collectives
    tpu_cfg = config.get("tpu", {})
    data_axis = int(tpu_cfg.get("data_axis", 1))
    model_axis = int(tpu_cfg.get("model_axis", 1))
    mesh = None
    if data_axis * model_axis > 1:
        from smokephysai_tpu.parallel.mesh import make_mesh
        from smokephysai_tpu.parallel.sharding import shard_batch, shard_params

        mesh = make_mesh(data=data_axis, model=model_axis)
        state = state.replace(params=shard_params(state.params, mesh))
        print_fn(f"Mesh: data={data_axis} model={model_axis}")

        _shard_batch = lambda b: shard_batch(b, mesh)
    else:
        _shard_batch = lambda b: b

    start_epoch = 0
    best_val_loss = val_loss = float("inf")
    if resume_from:
        state, meta = restore_checkpoint(resume_from, state)
        start_epoch = int(meta.get("epoch", 0)) + 1
        best_val_loss = float(meta.get("val_loss", float("inf")))
        print_fn(f"Resumed from {resume_from} at epoch {start_epoch}")

    # Opt-in EMA of params (training.ema_decay, e.g. 0.999; default off).
    # The EMA copy is what gets validated and checkpointed — resume then
    # continues FROM the EMA weights (documented divergence; no reference
    # analog, reference train.py has no EMA).
    ema_decay = float(tc.get("ema_decay", 0.0))
    noise_std = float(tc.get("noise_std", 0.0))
    tstep = make_train_step(
        config["physics"], ema_decay=ema_decay, noise_std=noise_std,
        rng_impl=rng_impl,
    )
    if noise_std:
        print_fn(f"Input-noise augmentation (std {noise_std})")
    estep = make_eval_step(config["physics"])
    # init as a COPY — the step donates both state and ema, and aliasing
    # the same buffers into two donated args is a runtime error
    ema_params = (
        jax.tree_util.tree_map(jnp.copy, state.params) if ema_decay else None
    )
    if ema_decay:
        print_fn(f"EMA enabled (decay {ema_decay})")

    # tpu.fused_epoch: run each epoch (and val pass) as ONE jitted scan —
    # see make_train_epoch. Only for device-resident datasets on a single
    # chip; everything else keeps the per-batch loop.
    fused = (
        bool(tpu_cfg.get("fused_epoch", False))
        and mesh is None
        and getattr(train_ds, "_on_device", False)
        and getattr(val_ds, "_on_device", False)
        and len(train_ds) >= batch_size
    )
    if fused:
        tepoch = make_train_epoch(
            train_ds, config["physics"], batch_size, ema_decay=ema_decay,
            noise_std=noise_std, rng_impl=rng_impl,
        )
        eepoch = make_eval_epoch(val_ds, config["physics"], batch_size)
        print_fn("Fused-epoch training: one XLA program per epoch")

    # Per-epoch keys, split up-front with the exact sequence the in-loop
    # `key, k_epoch, k_eval = split(key, 3)` produced (value-identical) —
    # the staged host path needs epoch e+1's key before epoch e finishes.
    epoch_keys = []
    for _ in range(start_epoch, tc["num_epochs"]):
        key, k_ep, k_ev = jax.random.split(key, 3)
        epoch_keys.append((k_ep, k_ev))

    # tpu.fused_epoch on a HOST-resident dataset: stage each epoch's
    # batches on host and ship them in one put, overlapped with the
    # previous epoch's compute by a producer thread (two RPCs per epoch
    # vs four per batch; see make_train_epoch_staged).
    staged = (
        bool(tpu_cfg.get("fused_epoch", False))
        and not fused
        and mesh is None
        and hasattr(train_ds, "stage_epoch")
        and not getattr(train_ds, "_on_device", True)
        and len(train_ds) >= batch_size
    )
    if staged:
        tepoch_staged = make_train_epoch_staged(
            config["physics"], ema_decay=ema_decay, noise_std=noise_std,
            rng_impl=rng_impl,
        )
        import queue as _queue
        import threading as _threading

        stage_q: "_queue.Queue" = _queue.Queue(maxsize=1)

        def _stage_worker():
            try:
                for k_ep, _ in epoch_keys:
                    host = train_ds.stage_epoch(k_ep, batch_size)
                    stage_q.put(jax.device_put(host))
            except BaseException as e:  # surface on the consumer
                stage_q.put(e)

        _threading.Thread(target=_stage_worker, daemon=True).start()
        print_fn("Staged-epoch training: host batches shipped once per epoch")

    def _unstack(stacked: Dict[str, np.ndarray]):
        num = len(next(iter(stacked.values())))
        return [{k: v[i] for k, v in stacked.items()} for i in range(num)]

    for epoch, (k_epoch, k_eval) in zip(
        range(start_epoch, tc["num_epochs"]), epoch_keys
    ):
        t0 = time.time()
        train_metrics = []
        batch_logs = []  # (global_step, device metrics) — materialised at
        # epoch end; a device_get inside the loop drains the dispatch
        # pipeline (one tunnel round-trip stall per log)
        if fused or staged:
            if staged:
                staged_dev = stage_q.get()
                if isinstance(staged_dev, BaseException):
                    raise staged_dev
                if ema_decay:
                    state, ema_params, stacked = tepoch_staged(
                        state, ema_params, staged_dev, k_epoch
                    )
                else:
                    state, stacked = tepoch_staged(state, staged_dev, k_epoch)
            elif ema_decay:
                state, ema_params, stacked = tepoch(state, ema_params, k_epoch)
            else:
                state, stacked = tepoch(state, k_epoch)
            train_metrics = _unstack(jax.device_get(stacked))
            if writer is not None:
                batch_logs = [
                    (epoch * steps_per_epoch + i, train_metrics[i])
                    for i in range(0, len(train_metrics), log_every)
                ]
        else:
            for batch_idx, batch in enumerate(
                train_ds.epoch_batches(k_epoch, batch_size, shuffle=True)
            ):
                if ema_decay:
                    state, ema_params, metrics = tstep(
                        state, ema_params, _shard_batch(batch), k_epoch
                    )
                else:
                    state, metrics = tstep(state, _shard_batch(batch), k_epoch)
                train_metrics.append(metrics)
                if writer is not None and batch_idx % log_every == 0:
                    batch_logs.append(
                        (epoch * steps_per_epoch + batch_idx, metrics)
                    )
        for gs, metrics in batch_logs:
            m = jax.device_get(metrics)
            writer.add_scalar("Train/Batch_Total_Loss", float(m["total_loss"]), gs)
            writer.add_scalar("Train/Batch_Recon_Loss", float(m["recon_loss"]), gs)
            writer.add_scalar(
                "Train/Batch_Physics_Loss", float(m["physics_loss"]), gs
            )
            writer.add_scalar("Train/Batch_Chaos_Loss", float(m["chaos_loss"]), gs)

        val_metrics = []
        val_state = (
            state.replace(params=ema_params) if ema_decay else state
        )
        if fused:
            val_metrics = _unstack(jax.device_get(eepoch(val_state, k_eval)))
            n_val = len(val_ds)
            if n_val % batch_size:  # ragged tail, same draws as the loop path
                from smokephysai_tpu.data.synthetic import epoch_order_frames

                order, frames = epoch_order_frames(
                    k_eval, n_val, val_ds.sequence_length, shuffle=False
                )
                tail = order[(n_val // batch_size) * batch_size:]
                val_metrics.append(
                    estep(val_state, val_ds.get_batch(tail, frames[tail]), k_eval)
                )
        else:
            for batch in val_ds.epoch_batches(k_eval, batch_size, shuffle=False):
                val_metrics.append(estep(val_state, _shard_batch(batch), k_eval))

        def avg(ms, k):
            return float(np.mean([np.asarray(m[k]) for m in ms])) if ms else 0.0

        train_loss = avg(train_metrics, "total_loss")
        val_loss = avg(val_metrics, "total_loss")
        lr = float(
            cosine_epoch_schedule(
                tc["learning_rate"], tc["num_epochs"], steps_per_epoch,
                tc.get("schedule_epochs"), tc.get("schedule_epoch_offset", 0),
            )(state.step)
        )
        if writer is not None:
            writer.add_scalar("Train/Epoch_Loss", train_loss, epoch)
            writer.add_scalar("Val/Epoch_Loss", val_loss, epoch)
            writer.add_scalar("Learning_Rate", lr, epoch)
        print_fn(
            f"Epoch {epoch + 1}/{tc['num_epochs']}: "
            f"train {train_loss:.4f} val {val_loss:.4f} lr {lr:.6f} "
            f"({time.time() - t0:.1f}s)"
        )

        state = state.replace(epoch=jnp.int32(epoch))
        if val_loss < best_val_loss:
            best_val_loss = val_loss
            meta = {"epoch": epoch, "val_loss": val_loss, "config": config}
            if ema_decay:
                meta["ema_decay"] = ema_decay
            save_checkpoint(
                exp_dir,
                state.replace(params=ema_params) if ema_decay else state,
                meta,
            )

    final_state = state.replace(params=ema_params) if ema_decay else state
    # Honest meta even when the epoch loop never ran (e.g. resume at the
    # final epoch): epoch = last epoch actually in the state, and never
    # serialize float('inf') — json.dumps would emit `Infinity`, which
    # strict JSON parsers reject.
    save_checkpoint(
        exp_dir,
        final_state,
        {
            "epoch": int(state.epoch),
            "val_loss": val_loss if math.isfinite(val_loss) else None,
            "config": config,
        },
        name=LAST_NAME,
    )
    return final_state
