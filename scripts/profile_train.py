"""Per-stage breakdown of the training step (VERDICT r4 next #2: train MFU
is 0.22 vs serving's 0.56-0.63 and 'the train step never got the same
treatment' as the streaming profile).

Times nested sub-programs of the train step on the real TPU, slope-timed
over rep counts so the ~25 ms tunnel dispatch cancels, and prints the
per-stage deltas:

  enc_fwd     conv encoder + token projection, train-mode BN
  trunk_fwd   + the 6 chaos-transformer layers (dropout armed)
  full_fwd    + decode/heads + loss (= value of loss_fn)
  enc_grad    grad of sum(encode) wrt params        -> enc bwd = this - enc_fwd
  trunk_grad  grad of sum(trunk(encode)) wrt params -> trunk bwd = delta
  fwd_bwd     grad of the full loss                 -> total bwd = this - full_fwd
  full_step   + AdamW update + BN merge (= make_train_step program)

Stage FLOPs come from XLA cost analysis (variables passed as jit ARGUMENTS
— closure constants would embed params as module literals, CLAUDE.md).

Run from repo root:
  python scripts/profile_train.py [--batch 8] [--dtype bfloat16]
         [--no_flash] [--no_fast_math] [--json]

The train arch being profiled is reference smokephys_net.py:78-132 trained
by reference train.py:41-127 (batch 8, 128^2).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smokephysai_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def slope_time(fn, *args, n_small=10, n_big=40, tries=2):
    """Per-call device seconds: queue n calls back-to-back (async dispatch
    overlaps compute), scalar-readback once, slope over (n_big - n_small)
    cancels the constant dispatch/readback overhead."""
    out = fn(*args)  # compile + warm
    float(jax.tree_util.tree_leaves(out)[0].sum())

    def run(n):
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            o = None
            for _ in range(n):
                o = fn(*args)
            float(jax.tree_util.tree_leaves(o)[0].sum())
            best = min(best, time.perf_counter() - t0)
        return best

    t_s, t_b = run(n_small), run(n_big)
    return (t_b - t_s) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--grid", type=int, default=128)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--no_flash", action="store_true")
    ap.add_argument("--no_fast_math", action="store_true")
    ap.add_argument("--rng", default="threefry",
                    help="per-step PRNG impl: threefry (parity) | rbg")
    ap.add_argument("--json", action="store_true", help="one JSON line out")
    ap.add_argument("--n_small", type=int, default=10,
                    help="slope-timing short rep count")
    ap.add_argument("--n_big", type=int, default=40,
                    help="slope-timing long rep count")
    cli = ap.parse_args()

    from smokephysai_tpu.train.loop import (
        compute_losses,
        create_train_state,
        make_train_step,
    )
    from smokephysai_tpu.utils.config import load_config
    from smokephysai_tpu.utils.profiling import flops_estimate, mfu

    config = load_config()
    config["tpu"]["train_compute_dtype"] = cli.dtype
    config["tpu"]["use_flash"] = not cli.no_flash
    config["tpu"]["fast_math"] = not cli.no_fast_math
    physics_cfg = config["physics"]

    state = create_train_state(config, jax.random.PRNGKey(0))
    model = state.apply_fn.__self__  # bound Module of TrainState.apply_fn
    # every key here stays threefry regardless of --rng: the full step
    # re-wraps its streams in-trace (loop._make_step_impl rng_impl) and
    # the sub-stage programs convert their rngs dict the same way below.
    # An EAGER top-level rbg uniform hung the axon backend for 20+ min on
    # 2026-08-20; in-trace rbg bits are fine (probe_train_hotspots).
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    B, G = cli.batch, cli.grid
    batch = {
        "input": jax.random.uniform(ks[0], (B, G, G, 1)),
        "target": jax.random.uniform(ks[1], (B, G, G, 1)),
        "chaos_features": jax.random.uniform(ks[2], (B, 3)),
    }
    k_chaos, k_drop = jax.random.split(key)
    rngs = {"chaos": k_chaos, "dropout": k_drop}
    if cli.rng != "threefry":
        # re-wrap as typed keys for the sub-stage programs (key creation
        # never executes RngBitGenerator; only downstream jitted use does)
        rngs = {
            name: jax.random.wrap_key_data(
                jax.random.bits(k, (4,), jnp.uint32), impl=cli.rng
            )
            for name, k in rngs.items()
        }

    # --- forward sub-programs (params/batch_stats as ARGUMENTS) ---
    def enc_fwd(params, bs, x):
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, x, True,
            method="encode", mutable=["batch_stats"], rngs=rngs,
        )
        return out

    def trunk_fwd(params, bs, x):
        feats, mut = model.apply(
            {"params": params, "batch_stats": bs}, x, True,
            method="encode", mutable=["batch_stats"], rngs=rngs,
        )
        out, _ = model.apply(
            {"params": params, "batch_stats": bs}, feats, True,
            method="trunk", mutable=["batch_stats"], rngs=rngs,
        )
        return out

    def full_fwd(params, bs, x, tgt, cf):
        outputs, _ = model.apply(
            {"params": params, "batch_stats": bs}, x, train=True,
            rngs=rngs, mutable=["batch_stats"],
        )
        total, _ = compute_losses(
            outputs, {"input": x, "target": tgt, "chaos_features": cf},
            physics_cfg,
        )
        return total

    # --- grad sub-programs ---
    def enc_grad(params, bs, x):
        return jax.grad(lambda p: jnp.sum(enc_fwd(p, bs, x)).astype(jnp.float32))(params)

    def trunk_grad(params, bs, x):
        return jax.grad(lambda p: jnp.sum(trunk_fwd(p, bs, x)).astype(jnp.float32))(params)

    def fwd_bwd(params, bs, x, tgt, cf):
        return jax.grad(full_fwd)(params, bs, x, tgt, cf)

    # --- full step (the production program; non-donated copy so we can
    # call it repeatedly on the same state) ---
    step_impl = make_train_step(physics_cfg, rng_impl=cli.rng)

    p, bs = state.params, state.batch_stats
    x, tgt, cf = batch["input"], batch["target"], batch["chaos_features"]

    stages = {}
    flops = {}
    jits = {
        "enc_fwd": (jax.jit(enc_fwd), (p, bs, x)),
        "trunk_fwd": (jax.jit(trunk_fwd), (p, bs, x)),
        "full_fwd": (jax.jit(full_fwd), (p, bs, x, tgt, cf)),
        "enc_grad": (jax.jit(enc_grad), (p, bs, x)),
        "trunk_grad": (jax.jit(trunk_grad), (p, bs, x)),
        "fwd_bwd": (jax.jit(fwd_bwd), (p, bs, x, tgt, cf)),
    }
    for name, (fn, args) in jits.items():
        t0 = time.perf_counter()
        stages[name] = slope_time(
            fn, *args, n_small=cli.n_small, n_big=cli.n_big
        ) * 1000.0
        fl = flops_estimate(fn, *args)
        if fl:
            flops[name] = fl
        print(
            f"[profile] {name:11s} {stages[name]:8.2f} ms  "
            f"({time.perf_counter()-t0:5.1f} s incl. compile)",
            file=sys.stderr, flush=True,
        )

    # full step: state is donated, so chain it (the donated buffers come
    # back as the new state) — this is exactly bench_train_step's pattern
    st = state

    def run_step(n):
        nonlocal st
        best = float("inf")
        m = None
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                st, m = step_impl(st, batch, key)
            float(m["total_loss"])
            best = min(best, time.perf_counter() - t0)
        return best

    st, m = step_impl(st, batch, key)
    float(m["total_loss"])
    t10, t40 = run_step(cli.n_small), run_step(cli.n_big)
    stages["full_step"] = (t40 - t10) / (cli.n_big - cli.n_small) * 1000.0
    print(f"[profile] full_step   {stages['full_step']:8.2f} ms",
          file=sys.stderr, flush=True)

    # --- derived deltas ---
    d = {
        "enc_fwd_ms": stages["enc_fwd"],
        "trunk_fwd_ms": stages["trunk_fwd"] - stages["enc_fwd"],
        "decode_loss_fwd_ms": stages["full_fwd"] - stages["trunk_fwd"],
        "enc_bwd_ms": stages["enc_grad"] - stages["enc_fwd"],
        "trunk_bwd_ms": (stages["trunk_grad"] - stages["enc_grad"])
        - (stages["trunk_fwd"] - stages["enc_fwd"]),
        "decode_loss_bwd_ms": (stages["fwd_bwd"] - stages["trunk_grad"])
        - (stages["full_fwd"] - stages["trunk_fwd"]),
        "optimizer_ms": stages["full_step"] - stages["fwd_bwd"],
    }
    result = {
        "config": {
            "batch": B, "grid": G, "dtype": cli.dtype,
            "use_flash": not cli.no_flash, "fast_math": not cli.no_fast_math,
            "rng": cli.rng,
        },
        "stages_ms": {k: round(v, 2) for k, v in stages.items()},
        "deltas_ms": {k: round(v, 2) for k, v in d.items()},
    }
    if "fwd_bwd" in flops:
        u = mfu(flops["fwd_bwd"] / (stages["full_step"] / 1000.0))
        if u:
            result["train_mfu_full_step"] = round(u, 3)
        result["flops"] = {k: round(v / 1e9, 1) for k, v in flops.items()}

    if cli.json:
        print(json.dumps(result), flush=True)
    else:
        print(json.dumps(result, indent=2), flush=True)


if __name__ == "__main__":
    main()
