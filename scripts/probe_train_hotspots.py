"""Micro-probes for the train-step trunk hotspot (VERDICT r4 next #2).

profile_train.py showed trunk fwd 5.8 ms / trunk bwd 14.5 ms of the 25 ms
batch-8 step (MFU 0.214). Two suspects this probe isolates on the real TPU:

  dropout    trunk fwd+bwd with dropout ARMED vs DETERMINISTIC (the chaos
             RNG stream runs in both modes, so the delta is pure dropout:
             mask generation ~126M threefry bits/step at batch 8 + the
             mask multiplies)
  rng impl   the same armed trunk under 'rbg' PRNG keys (cheap per-bit
             generation on TPU) vs default threefry

Run from repo root: python scripts/probe_train_hotspots.py [--batch 8]
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
    out = fn(*args)
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

    return (run(n_big) - run(n_small)) / (n_big - n_small)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    cli = ap.parse_args()

    from smokephysai_tpu.train.loop import create_train_state
    from smokephysai_tpu.utils.config import load_config

    config = load_config()
    config["tpu"]["train_compute_dtype"] = "bfloat16"
    config["tpu"]["use_flash"] = True
    config["tpu"]["fast_math"] = True

    state = create_train_state(config, jax.random.PRNGKey(0))
    model = state.apply_fn.__self__
    p, bs = state.params, state.batch_stats
    B = cli.batch
    feats = jax.random.normal(
        jax.random.PRNGKey(2), (B, 1024, config["model"]["hidden_dim"])
    )

    def make_trunk(train, rngs):
        def fwd(params, x):
            return model.apply(
                {"params": params, "batch_stats": bs}, x, train,
                method="trunk", rngs=rngs,
            )

        def grad(params, x):
            return jax.grad(
                lambda pp: jnp.sum(fwd(pp, x)).astype(jnp.float32)
            )(params)

        return jax.jit(fwd), jax.jit(grad)

    tf_keys = {"chaos": jax.random.PRNGKey(3),
               "dropout": jax.random.PRNGKey(4)}
    rbg_keys = {"chaos": jax.random.key(3, impl="rbg"),
                "dropout": jax.random.key(4, impl="rbg")}

    results = {}
    cases = [
        ("armed_threefry", True, tf_keys),
        ("deterministic", False, tf_keys),
        ("armed_rbg", True, rbg_keys),
    ]
    for name, train, rngs in cases:
        try:
            f, g = make_trunk(train, rngs)
            t_f = slope_time(f, p, feats) * 1000
            t_g = slope_time(g, p, feats) * 1000
            results[name] = {"fwd_ms": round(t_f, 2),
                             "fwd_bwd_ms": round(t_g, 2)}
            print(f"[probe] {name:16s} fwd {t_f:6.2f} ms   fwd+bwd {t_g:6.2f} ms",
                  file=sys.stderr, flush=True)
        except Exception as e:  # rbg may be unsupported on this backend
            results[name] = {"error": repr(e)[:200]}
            print(f"[probe] {name:16s} ERROR {e!r}", file=sys.stderr, flush=True)

    print(json.dumps({"batch": B, "trunk": results}), flush=True)


if __name__ == "__main__":
    main()
