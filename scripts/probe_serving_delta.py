"""Bisect the batch-64 serving regression (VERDICT r4 next #5: driver-
verified 2227.6 fps in r2 vs ~1950 in r5, -12%; suspect is the r4
params-as-jit-arguments refactor, commit 013864b).

Times three predictor constructions at batch 64, bf16+flash+fast_math:

  args    variables as jit arguments (make_predictor today)
  auto    variables as arguments with Layout.AUTO — compile chooses the
          weight layouts, then variables are device_put once into the
          compiled program's preferred formats
  closure variables as closure constants (the r2-era construction; embeds
          ~111 MB of literals in the module — slow/stally remote compile,
          run LAST so a stall can't block the other measurements)

Run from repo root: python scripts/probe_serving_delta.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from smokephysai_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from smokephysai_tpu.train.serving import build_model, make_predictor

CFG = {
    "model": {
        "input_dim": 128, "hidden_dim": 512, "num_layers": 6,
        "num_heads": 8, "output_channels": 64, "chaos_strength": 0.1,
    },
    "tpu": {"compute_dtype": "bfloat16", "use_flash": True,
            "fast_math": True},
}


def fps(pred, xb, reps=30, tries=3):
    float(pred(xb)["reconstructed"].sum())  # warm + readback
    best = 0.0
    for _ in range(tries):
        t0 = time.perf_counter()
        outs = [pred(xb)["reconstructed"] for _ in range(reps)]
        float(outs[-1].sum())
        best = max(best, reps * 64.0 / (time.perf_counter() - t0))
    return best


def main():
    model = build_model(CFG)
    xb = jnp.zeros((64, 128, 128, 1), jnp.float32)
    vs = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        xb, train=False,
    )
    key = jax.random.PRNGKey(0)

    # (a) today's construction
    t0 = time.perf_counter()
    pred_args = make_predictor(model, vs)
    r_args = fps(pred_args, xb)
    print(f"args    {r_args:8.1f} fps  (section {time.perf_counter()-t0:.0f}s)",
          flush=True)

    # (b) AUTO layout: let the compiler pick weight layouts, put once
    t0 = time.perf_counter()
    from jax.experimental.layout import Format, Layout

    def fwd(variables, x):
        return model.apply(variables, x, train=False, rngs={"chaos": key})

    auto = Format(Layout.AUTO)
    jf = jax.jit(fwd, in_shardings=(auto, auto))
    compiled = jf.lower(vs, xb).compile()
    (vs_fmt, x_fmt), _ = compiled.input_formats
    vs_opt = jax.device_put(vs, vs_fmt)
    xb_opt = jax.device_put(xb, x_fmt)
    r_auto = fps(lambda x: compiled(vs_opt, x), xb_opt)
    print(f"auto    {r_auto:8.1f} fps  (section {time.perf_counter()-t0:.0f}s)",
          flush=True)

    # (c) closure constants (r2 construction) — LAST, may stall on compile
    if os.environ.get("PROBE_SKIP_CLOSURE", "0") != "1":
        t0 = time.perf_counter()

        @jax.jit
        def pred_closure(x):
            return model.apply(vs, x, train=False, rngs={"chaos": key})

        r_clo = fps(pred_closure, xb)
        print(f"closure {r_clo:8.1f} fps  (section {time.perf_counter()-t0:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
