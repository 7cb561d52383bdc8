"""Per-stage breakdown of the fused 1024^2 streaming frame (VERDICT r2
weak #2: 'no profile of the fused rollout exists').

Times four nested rollout variants on the real TPU (slope over frames so
the ~25 ms tunnel dispatch cancels) and prints the per-stage deltas:

  sim            solver.step + fractal perturbation only
  +encode        ... + conv encoder + token projection (no trunk/heads)
  +trunk         ... + the 6 chaos-transformer layers
  full           ... + decode/heads (= streaming_rollout)

Run from repo root: python scripts/profile_streaming.py [--grid 1024]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax


def build(grid, use_flash, fast_math, fast_encoder):
    from smokephysai_tpu.train.serving import build_model

    config = {
        "model": {
            "input_dim": 128, "hidden_dim": 512, "num_layers": 6,
            "num_heads": 8, "output_channels": 64, "chaos_strength": 0.1,
        },
        "tpu": {
            "compute_dtype": "bfloat16", "use_flash": use_flash,
            "fast_math": fast_math, "fast_encoder": fast_encoder,
        },
    }
    model = build_model(config)
    x = jnp.zeros((1, grid, grid, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables


def make_rollout(model, variables, grid, stage):
    """Rollout scanning `frames` fused steps, truncated at `stage`."""
    from smokephysai_tpu.physics import add_smoke_source, init_state
    from smokephysai_tpu.physics.fractal import fractal_field
    from smokephysai_tpu.physics.simulator import FRACTAL_INTENSITY
    from smokephysai_tpu.physics import solver

    state = init_state((grid, grid))
    state = state.replace(
        density=add_smoke_source(state.density, grid / 2, grid / 2, 32.0, 1.5)
    )
    fractal = jnp.asarray(fractal_field((grid, grid)))
    chaos_key = jax.random.PRNGKey(0)

    def body(carry, _):
        # variables ride in the scan CARRY (a jit argument), not the
        # closure — closed-over params embed ~111 MB of literals in the
        # module (see serving.make_predictor)
        s, variables = carry
        s = solver.step(s, use_pallas=True)
        frame = s.density * (1.0 + FRACTAL_INTENSITY * fractal)
        out = jnp.float32(0)
        if stage != "sim":
            x = frame[None, :, :, None]
            m = model.bind(variables, rngs={"chaos": chaos_key})
            feats = m.encode(x, train=False)
            if stage == "encode":
                out = jnp.sum(feats).astype(jnp.float32)
            else:
                feats = m.trunk(feats, train=False)
                if stage == "trunk":
                    out = jnp.sum(feats).astype(jnp.float32)
                else:
                    res = m.decode(feats, (grid, grid), train=False)
                    out = res["physics_features"].sum()
        else:
            out = jnp.sum(frame)
        return (s, variables), out

    return (state, variables), body


def timed_fps(state, body, n_lo=10, n_hi=40):
    def run(n):
        f = jax.jit(lambda s: lax.scan(body, s, None, length=n))
        _, outs = f(state)
        float(outs.sum())  # scalar readback (tunnel-safe)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            _, outs = f(state)
            float(outs.sum())
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = run(n_lo), run(n_hi)
    return (n_hi - n_lo) / (t_hi - t_lo)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=1024)
    ap.add_argument(
        "--flash", action=argparse.BooleanOptionalAction, default=True,
        help="token-major flash attention (--no-flash for einsum parity)",
    )
    ap.add_argument(
        "--fast_math", action=argparse.BooleanOptionalAction, default=True,
        help="bf16 residual + tanh GELU (--no-fast_math for parity path)",
    )
    args = ap.parse_args()

    print(f"devices: {jax.devices()}", file=sys.stderr)
    results = {}
    for label, stage, fast_enc in [
        ("sim only", "sim", False),
        ("sim+encode", "encode", False),
        ("sim+encode+trunk", "trunk", False),
        ("full frame", "full", False),
        ("full frame (fast_encoder)", "full", True),
    ]:
        model, variables = build(
            args.grid, args.flash, args.fast_math, fast_enc
        )
        state, body = make_rollout(model, variables, args.grid, stage)
        fps = timed_fps(state, body)
        results[label] = fps
        print(f"{label:<28} {fps:9.1f} fps   {1000.0/fps:7.2f} ms/frame",
              flush=True)

    ms = {k: 1000.0 / v for k, v in results.items()}
    print("\nper-stage deltas (ms/frame):")
    print(f"  sim            {ms['sim only']:.2f}")
    print(f"  encoder        {ms['sim+encode'] - ms['sim only']:.2f}")
    print(f"  trunk          {ms['sim+encode+trunk'] - ms['sim+encode']:.2f}")
    print(f"  decode/heads   {ms['full frame'] - ms['sim+encode+trunk']:.2f}")


if __name__ == "__main__":
    main()
