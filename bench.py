#!/usr/bin/env python
"""Headline benchmark: p50 per-frame inference latency of the flagship
SmokePhysNet on one chip, reference protocol (batch 4, 128x128 frames —
reference benchmark.py:257-264; baseline 610.92 ms/frame on an RTX 3090,
README.md:24 / BASELINE.md).

Prints the cumulative JSON line
  {"metric": ..., "value": ..., "unit": "ms", "vs_baseline": speedup,
   "extra": {...secondary metrics...}}
after EVERY completed measurement (the driver takes the last parseable
line), so a timeout/OOM/tunnel-wedge at any point still records everything
measured so far.

Secondary metrics in "extra": simulation throughput (steps/sec at 256^2,
the BASELINE.json tracked metric) for both the XLA and Pallas solver paths.
"""
import json
import sys
import time

import numpy as np

BASELINE_MS_PER_FRAME = 610.92  # reference README.md:24
BATCH = 4  # reference benchmark.py:263


def bench_inference(compute_dtype="float32"):
    import jax
    import jax.numpy as jnp

    from smokephysai_tpu.train.serving import build_model, make_predictor

    config = {
        "model": {
            "input_dim": 128,
            "hidden_dim": 512,
            "num_layers": 6,
            "num_heads": 8,
            "output_channels": 64,
            "chaos_strength": 0.1,
        },
        "tpu": {"compute_dtype": compute_dtype},
    }
    model = build_model(config)
    x = jnp.zeros((BATCH, 128, 128, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    predict = make_predictor(model, variables)

    # warm-up / compile
    jax.block_until_ready(predict(x)["reconstructed"])

    # per-call p50 (includes one host->device round-trip per batch)
    times = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = predict(x)
        jax.block_until_ready(out["reconstructed"])
        times.append((time.perf_counter() - t0) / BATCH * 1000.0)  # ms/frame
    p50_sync = float(np.percentile(times, 50))

    # pipelined timing: issue all batches asynchronously, block once. This
    # matches the reference protocol (its torch timing never synchronised
    # CUDA, benchmark.py:131-133) and measures device throughput rather
    # than per-call dispatch latency.
    reps = 50
    t0 = time.perf_counter()
    outs = [predict(x)["reconstructed"] for _ in range(reps)]
    jax.block_until_ready(outs)
    pipelined = (time.perf_counter() - t0) / (reps * BATCH) * 1000.0
    return pipelined, p50_sync


def bench_sim(grid=256, steps=100, use_pallas=False):
    """steps/s of the scan-fused solver loop, ONE jitted call per timing.
    At the default steps=100 this includes the ~30 ms axon-tunnel dispatch
    (an honest per-call serving number but dispatch-dominated)."""
    import jax

    from smokephysai_tpu.physics import add_smoke_source, init_state
    from smokephysai_tpu.physics.solver import multi_step

    state = init_state((grid, grid))
    state = state.replace(
        density=add_smoke_source(state.density, grid / 2, grid / 2, 10.0, 1.5)
    )
    # warm-up / compile with the SAME scan length as the timed run
    s, _ = multi_step(state, steps, use_pallas=use_pallas)
    float(s.density.sum())  # scalar readback, not block_until_ready (tunnel)

    t0 = time.perf_counter()
    s, _ = multi_step(state, steps, use_pallas=use_pallas)
    float(s.density.sum())
    dt = time.perf_counter() - t0
    return steps / dt


def bench_sim_compute(grid=256, use_pallas=False):
    """Pure per-step COMPUTE rate, dispatch excluded by slope timing: time
    multi-step programs of 200 and 1200 steps (trajectory-free fori_loop over
    solver.step) and divide the difference. This is the number the fused
    whole-episode Pallas kernel is judged on."""
    import jax
    from jax import lax

    from smokephysai_tpu.physics import add_smoke_source, init_state
    from smokephysai_tpu.physics.solver import step

    state = init_state((grid, grid))
    state = state.replace(
        density=add_smoke_source(state.density, grid / 2, grid / 2, 10.0, 1.5)
    )

    def run(n):
        f = jax.jit(
            lambda s: lax.fori_loop(
                0, n, lambda _, c: step(c, use_pallas=use_pallas), s
            )
        )
        s = f(state)
        float(s.density.sum())
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            s = f(state)
            float(s.density.sum())
            best = min(best, time.perf_counter() - t0)
        return best

    # span must dwarf the tunnel's ms-scale latency variance: a 1000-step
    # span at the fused kernel's ~13 us/step is ~13 ms — same order as the
    # per-call jitter, which once yielded a nonsense 2.8M steps/s reading.
    # 5000 steps puts the signal ~10x above the noise.
    t_short, t_long = run(200), run(5200)
    return 5000.0 / (t_long - t_short)


def bench_streaming(
    grid=1024, frames=30, use_flash=False, fast_math=False,
    fast_encoder=False,
):
    """Fused sim+encode streaming rollout fps at `grid`^2 (BASELINE.json
    configs[4]: 'Streaming 30fps 1024x1024 video'). `fast_encoder` pools
    the frame to 128^2 before the conv encoder (documented divergence —
    the full-res enc_conv2 is ~154 GFLOP/frame, ~2/3 of the parity
    frame)."""
    import jax
    import jax.numpy as jnp

    from smokephysai_tpu.physics import add_smoke_source, init_state
    from smokephysai_tpu.train.serving import build_model
    from smokephysai_tpu.train.streaming import streaming_rollout

    config = {
        "model": {
            "input_dim": 128,
            "hidden_dim": 512,
            "num_layers": 6,
            "num_heads": 8,
            "output_channels": 64,
            "chaos_strength": 0.1,
        },
        "tpu": {
            "compute_dtype": "bfloat16",
            "use_flash": use_flash,
            "fast_math": fast_math,
            "fast_encoder": fast_encoder,
        },
    }
    model = build_model(config)
    x = jnp.zeros((1, grid, grid, 1), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    state = init_state((grid, grid))
    state = state.replace(
        density=add_smoke_source(state.density, grid / 2, grid / 2, 32.0, 1.5)
    )

    # streaming_rollout is jitted internally with variables as an argument;
    # wrapping it in another jit-over-a-closure would re-embed the params
    # as ~111 MB of module literals (slow remote compile)
    roll = lambda s: streaming_rollout(model, variables, s, num_frames=frames)
    final, outs = roll(state)  # compile + warm
    float(jnp.sum(outs["physics_features"]))  # scalar readback (tunnel-safe)
    t0 = time.perf_counter()
    final, outs = roll(state)
    float(jnp.sum(outs["physics_features"]))
    return frames / (time.perf_counter() - t0)


def bench_train_step(
    train_dtype="float32", use_flash=False, fast_math=False,
    batch=8, grid=128, flops_override=None, rng_impl="threefry",
):
    """Training-step device time (ms) + MFU at the reference recipe's shape
    (batch 8, 128^2 — reference train.py:41-127). Slope timing over chained
    donated steps (60 vs 10 reps) cancels the ~25 ms tunnel dispatch that a
    real epoch loop never pays back-to-back.

    MFU numerator: XLA's FLOP count for the whole fwd+bwd+AdamW program.
    Pallas kernel FLOPs are INVISIBLE to cost_analysis, so a flash-path
    program undercounts the work actually done; callers pass the einsum-
    path program's count as `flops_override` (same mathematical work, all
    of it visible) to make flash-variant MFU honest rather than deflated.
    Returns (ms_per_step, mfu_or_None, flops_or_None)."""
    import jax

    from smokephysai_tpu.train.loop import create_train_state, make_train_step
    from smokephysai_tpu.utils.config import load_config
    from smokephysai_tpu.utils.profiling import mfu

    config = load_config()
    config["tpu"]["train_compute_dtype"] = train_dtype
    config["tpu"]["use_flash"] = use_flash
    config["tpu"]["fast_math"] = fast_math
    state = create_train_state(config, jax.random.PRNGKey(0))
    # rng_impl='rbg' measures tpu.train_rng's fast path: threefry dropout
    # mask generation costs ~7.8 ms of the 25 ms bf16 step at batch 8
    # (scripts/probe_train_hotspots.py), rbg ~1 ms. The key stays threefry
    # — _make_step_impl re-wraps it in-trace (no eager rbg op ever hits
    # the backend; one hung the axon tunnel on 2026-08-20).
    tstep = make_train_step(config["physics"], rng_impl=rng_impl)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    b = {
        "input": jax.random.uniform(ks[0], (batch, grid, grid, 1)),
        "target": jax.random.uniform(ks[1], (batch, grid, grid, 1)),
        "chaos_features": jax.random.uniform(ks[2], (batch, 3)),
    }
    flops = None
    try:
        cost = tstep.lower(state, b, key).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost["flops"])
    except Exception:
        pass
    state, m = tstep(state, b, key)  # compile + warm
    float(m["total_loss"])

    def run(n):
        nonlocal state
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(n):
                state, m = tstep(state, b, key)
            float(m["total_loss"])  # scalar readback (tunnel-safe sync)
            best = min(best, time.perf_counter() - t0)
        return best

    t10, t60 = run(10), run(60)
    ms = (t60 - t10) / 50.0 * 1000.0
    numer = flops_override or flops
    u = mfu(numer / (ms / 1000.0)) if numer else None
    return ms, u, flops


def bench_train_epoch(
    mode, train_dtype="bfloat16", use_flash=True, fast_math=True, batch=8,
    num_samples=400,
):
    """Wall ms/step of a REAL training epoch — batch gathers + steps + epoch
    orchestration on a 400-episode 128² dataset, i.e. what fit() actually
    pays, unlike bench_train_step's back-to-back donated slope. (400
    episodes = 50 steps/epoch × 3 epochs per mode — enough to average the
    per-step wall; 800 pushed the four modes past the driver's budget and
    got streaming skipped in the r5 builder run.) Modes:

      loop        per-batch loop, device-resident data (one tunnel dispatch
                  per gather and per step, ~20-30 ms each)
      fused       train/loop.make_train_epoch (tpu.fused_epoch): ONE
                  dispatch per epoch
      host_loop   per-batch loop with the dataset forced HOST-resident
                  (3 H2D puts + 1 execute per batch — the 87 ms/step r3
                  path, VERDICT r4 weak #6)
      host_staged host-resident data via stage_epoch + the staged fused
                  program: one epoch-sized put + one dispatch per epoch
    """
    import jax
    import jax.numpy as jnp

    from smokephysai_tpu.data.synthetic import SyntheticSmokeDataset
    from smokephysai_tpu.train.loop import (
        create_train_state,
        make_train_epoch,
        make_train_epoch_staged,
        make_train_step,
    )
    from smokephysai_tpu.utils.config import load_config

    config = load_config()
    config["tpu"]["train_compute_dtype"] = train_dtype
    config["tpu"]["use_flash"] = use_flash
    config["tpu"]["fast_math"] = fast_math
    force_host = mode.startswith("host_")
    old_limit = SyntheticSmokeDataset.DEVICE_BYTES_LIMIT
    if force_host:
        SyntheticSmokeDataset.DEVICE_BYTES_LIMIT = 1
    try:
        ds = SyntheticSmokeDataset(
            num_samples=num_samples, grid_size=(128, 128), sequence_length=20,
            cache_path=f"./cache/train_128x128_T20_n{num_samples}_s0.npz",
            seed=0,
        )
    finally:
        SyntheticSmokeDataset.DEVICE_BYTES_LIMIT = old_limit
    steps = len(ds) // batch
    state = create_train_state(config, jax.random.PRNGKey(0), steps)
    key = jax.random.PRNGKey(1)

    if mode == "fused":
        tepoch = make_train_epoch(ds, config["physics"], batch)

        def one_epoch(k):
            nonlocal state
            state, m = tepoch(state, k)
            float(jnp.sum(m["total_loss"]))  # scalar readback (tunnel-safe)
    elif mode == "host_staged":
        tepoch_staged = make_train_epoch_staged(config["physics"])

        def one_epoch(k):
            nonlocal state
            # fit() overlaps this host assembly + put with the previous
            # epoch's compute via a producer thread; timing it inline here
            # makes the number an upper bound on what fit() pays
            staged = jax.device_put(ds.stage_epoch(k, batch))
            state, m = tepoch_staged(state, staged, k)
            float(jnp.sum(m["total_loss"]))
    else:  # loop / host_loop
        tstep = make_train_step(config["physics"])

        def one_epoch(k):
            nonlocal state
            m = None
            for b in ds.epoch_batches(k, batch, shuffle=True):
                state, m = tstep(state, b, k)
            float(m["total_loss"])

    one_epoch(key)  # compile + warm at the exact timed shapes
    best = float("inf")
    for i in range(2):
        k = jax.random.fold_in(key, i)
        t0 = time.perf_counter()
        one_epoch(k)
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1000.0


def _mark(name):
    print(f"[bench] {name} @ {time.strftime('%H:%M:%S')}", file=sys.stderr, flush=True)


# Cumulative result, re-printed after EVERY completed measurement so a
# timeout/OOM/tunnel-wedge at any point still leaves the driver a parseable
# JSON line with everything measured so far (the driver takes the last
# parseable line). Round 3's single end-of-run print lost 29 minutes of
# measurements to a timeout (BENCH_r03.json: rc=124, parsed=null).
RESULT = {
    "metric": "frame_inference_ms",
    "value": None,
    "unit": "ms",
    "vs_baseline": None,
    "extra": {},
}

from smokephysai_tpu.utils.compile_cache import (  # noqa: E402
    backup_cache,
    enable_compile_cache as _enable_compile_cache,
)


def _emit():
    print(json.dumps(RESULT), flush=True)
    # back up fresh compile-cache entries: machine restarts wipe /tmp and
    # round transitions have wiped cache/ — mirroring both ways means one
    # surviving copy re-seeds the other (r3 lost the cache to a restart
    # and the cold rerun timed out)
    backup_cache()


def _init_watchdog(timeout_s: int) -> None:
    """Guarantee ONE JSON line even if the TPU tunnel is wedged.

    A two-process collision can wedge the axon tunnel so that every
    backend init hangs indefinitely (CLAUDE.md, 2026-08-17 postmortem).
    Block here on jax.devices() under a watchdog: if init hasn't
    completed within timeout_s, print an error JSON line and hard-exit
    so the driver still records a bench artifact."""
    import os
    import threading

    done = threading.Event()

    def watch():
        if not done.wait(timeout_s):
            print(
                json.dumps(
                    {
                        "metric": "frame_inference_ms",
                        "value": None,
                        "unit": "ms",
                        "vs_baseline": None,
                        "extra": {
                            "error": (
                                f"TPU backend init exceeded {timeout_s}s "
                                "(wedged tunnel; see CLAUDE.md postmortem)"
                            )
                        },
                    }
                ),
                flush=True,
            )
            os._exit(2)

    threading.Thread(target=watch, daemon=True).start()
    import jax

    _mark(f"backend init (watchdog {timeout_s}s)")
    jax.devices()
    done.set()


# Priority order (VERDICT r4 #1): cheap solver compiles first, the headline
# second, then batch64 serving IMMEDIATELY after inference — its compile
# footprint overlaps the inference section and it was the one section the
# driver timeout ate in r3 AND r4. Slow train/streaming compiles go last.
SECTIONS = (
    "sim", "inference", "batch64", "sim_compute", "sim3d", "train", "streaming"
)

_T0 = time.perf_counter()


def _budget_left(budget_s: float) -> float:
    return budget_s - (time.perf_counter() - _T0)


def main():
    import argparse
    import os

    ap = argparse.ArgumentParser(description="SmokePhysAI-TPU headline bench")
    ap.add_argument(
        "--sections", type=str, default="all",
        help="comma-separated subset of " + ",".join(SECTIONS) + " — re-measure "
        "one metric without the full ~20 min run (default: all)",
    )
    cli = ap.parse_args()
    picked = set(SECTIONS if cli.sections == "all" else cli.sections.split(","))
    unknown = picked - set(SECTIONS)
    if unknown:
        ap.error(f"unknown sections {sorted(unknown)}; valid: {SECTIONS}")

    # Soft wall-clock budget: the driver kills bench.py with rc=124 at its
    # timeout (~30 min; did so in r3 AND r4). Exiting 0 with everything
    # measured so far beats being killed mid-section, so before each section
    # we stop if less than its historical cost remains (r4 _mark deltas,
    # warm-ish cache). Override with BENCH_BUDGET_S.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1440"))
    # conservative per-section cost estimates (s), from r4 section marks
    section_cost = {
        "sim": 90, "inference": 120, "batch64": 240, "sim_compute": 150,
        "sim3d": 240, "train": 480, "streaming": 300,
    }

    def over_budget(name):
        left = _budget_left(budget_s)
        if left < section_cost.get(name, 120):
            extra.setdefault("skipped_budget", []).append(name)
            _mark(f"SKIP {name} (budget: {left:.0f}s left)")
            return True
        return False

    _enable_compile_cache()  # config must precede backend init
    _init_watchdog(int(os.environ.get("BENCH_INIT_TIMEOUT_S", "900")))
    extra = RESULT["extra"]
    sec_t = extra.setdefault("section_s", {})

    def _done(name, t0):
        sec_t[name] = round(time.perf_counter() - t0, 1)

    # cheapest compiles first (solver scans), headline second — so even a
    # cold-cache run killed early leaves real measurements behind
    if "sim" in picked and not over_budget("sim"):
        t_sec = time.perf_counter()
        try:
            _mark("sim xla")
            extra["sim_steps_per_sec_256_xla"] = round(bench_sim(use_pallas=False), 1)
        except Exception as e:  # pragma: no cover
            extra["sim_xla_error"] = str(e)[:200]
        _emit()
        try:
            _mark("sim pallas")
            extra["sim_steps_per_sec_256_pallas"] = round(bench_sim(use_pallas=True), 1)
        except Exception as e:  # pragma: no cover
            extra["sim_pallas_error"] = str(e)[:200]
        _done("sim", t_sec)
        _emit()
    if "inference" in picked and not over_budget("inference"):
        t_sec = time.perf_counter()
        try:
            _mark("inference f32")
            pipelined_ms, p50_sync_ms = bench_inference()
            RESULT["value"] = round(pipelined_ms, 3)
            RESULT["vs_baseline"] = round(BASELINE_MS_PER_FRAME / pipelined_ms, 2)
            extra["p50_frame_inference_ms_percall"] = round(p50_sync_ms, 3)
        except Exception as e:  # pragma: no cover
            extra["inference_error"] = str(e)[:200]
        _emit()
        try:
            _mark("inference bf16")
            bf16_pipe, bf16_sync = bench_inference("bfloat16")
            extra["frame_inference_ms_bf16"] = round(bf16_pipe, 3)
        except Exception as e:  # pragma: no cover
            extra["bf16_error"] = str(e)[:200]
        _done("inference", t_sec)
        _emit()
    if "batch64" in picked and not over_budget("batch64"):
        t_sec = time.perf_counter()
        try:
            # serving throughput at batch 64, pipelined (device throughput with
            # per-call dispatch amortised — the tunnel adds ~25 ms per synced
            # call, which a real serving queue never pays). Three variants:
            # einsum parity path, Pallas token-major flash attention, and
            # flash + fast_math (bf16 residual stream + tanh GELU).
            import jax as _jax
            import jax.numpy as _jnp

            from smokephysai_tpu.train.serving import build_model, make_predictor

            def batch64_build(use_flash, fast_math):
                cfg = {
                    "model": {
                        "input_dim": 128, "hidden_dim": 512, "num_layers": 6,
                        "num_heads": 8, "output_channels": 64,
                        "chaos_strength": 0.1,
                    },
                    "tpu": {
                        "compute_dtype": "bfloat16", "use_flash": use_flash,
                        "fast_math": fast_math,
                    },
                }
                m = build_model(cfg)
                xb = _jnp.zeros((64, 128, 128, 1), _jnp.float32)
                vs = m.init(
                    {"params": _jax.random.PRNGKey(0),
                     "chaos": _jax.random.PRNGKey(1)},
                    xb, train=False,
                )
                return m, vs, xb

            def batch64_fps(m, vs, xb, auto_layout=False):
                pred = make_predictor(m, vs, auto_layout=auto_layout)
                float(pred(xb)["reconstructed"].sum())  # warm + readback
                reps = 30
                best = 0.0
                for _ in range(2):
                    t0 = time.perf_counter()
                    outs = [pred(xb)["reconstructed"] for _ in range(reps)]
                    float(outs[-1].sum())  # scalar readback (tunnel-safe sync)
                    best = max(best, reps * 64.0 / (time.perf_counter() - t0))
                return best

            _mark("batch64")
            m_e, vs_e, xb = batch64_build(False, False)
            extra["throughput_fps_batch64_bf16"] = round(
                batch64_fps(m_e, vs_e, xb), 1
            )
            _emit()
            extra["throughput_fps_batch64_bf16_flash"] = round(
                batch64_fps(*batch64_build(True, False)), 1
            )
            _emit()
            m_f, vs_f, _ = batch64_build(True, True)
            fast_fps = batch64_fps(m_f, vs_f, xb)
            extra["throughput_fps_batch64_bf16_flash_fast"] = round(fast_fps, 1)
            _emit()
            # + compiler-chosen weight layouts (make_predictor auto_layout):
            # the r2->r4 serving regression bisect (probe_serving_delta.py,
            # 2026-08-20) measured args 2146 / AUTO 2197 / r2-era closure
            # 2240 fps — AUTO recovers most of the layout freedom closure
            # constants got for free, without the 111 MB literal module.
            auto_fps = batch64_fps(m_f, vs_f, xb, auto_layout=True)
            extra["throughput_fps_batch64_bf16_flash_fast_auto"] = round(
                auto_fps, 1
            )
            fast_fps = max(fast_fps, auto_fps)
            _emit()
            # honest MFU: XLA's own FLOP count for the einsum-attention
            # forward (the flash kernel's FLOPs aren't in cost_analysis, so
            # this slightly undercounts the fast path's actual work).
            # CRITICAL: variables go in as ARGUMENTS — the r4 version closed
            # over them, embedding ~111 MB of param literals in the lowered
            # module, and the remote compile stall at exactly this point is
            # the most likely cause of the r4 rc=124 (CLAUDE.md closure-
            # constant trap).
            from smokephysai_tpu.utils.profiling import flops_estimate, mfu

            key = _jax.random.PRNGKey(0)
            fl = flops_estimate(
                lambda v, x: m_e.apply(v, x, train=False, rngs={"chaos": key}),
                vs_e, xb,
            )
            if fl:
                u = mfu(fl / 64.0 * fast_fps)
                if u:
                    extra["mfu_batch64_flash_fast"] = round(u, 3)
        except Exception as e:  # pragma: no cover
            extra["batch64_error"] = str(e)[:200]
        _done("batch64", t_sec)
        _emit()
    if "sim_compute" in picked and not over_budget("sim_compute"):
        t_sec = time.perf_counter()
        try:
            _mark("sim compute")
            extra["sim_compute_steps_per_sec_256_xla"] = round(
                bench_sim_compute(use_pallas=False), 1
            )
            _emit()
            extra["sim_compute_steps_per_sec_256_fused"] = round(
                bench_sim_compute(use_pallas=True), 1
            )
        except Exception as e:  # pragma: no cover
            extra["sim_compute_error"] = str(e)[:200]
        _done("sim_compute", t_sec)
        _emit()
    if "sim3d" in picked and not over_budget("sim3d"):
        t_sec = time.perf_counter()
        try:
            # 128^3 volumetric sim rate (BASELINE configs[3]); tent-shift
            # advection default — the trilinear gather ran at 1.76 steps/s
            _mark("sim3d 128^3")
            import jax as _j
            from jax import lax as _lax

            from smokephysai_tpu.physics.solver3d import (
                add_smoke_source3d, init_state3d, step3d,
            )

            s3 = init_state3d((128, 128, 128))
            s3 = s3.replace(
                density=add_smoke_source3d(s3.density, 64.0, 64.0, 20.0, 10.0, 1.5)
            )
            n3 = 50  # amortise the ~30 ms tunnel dispatch (1.5 ms/step at n=20)
            f3 = _j.jit(
                lambda st: _lax.fori_loop(
                    0, n3, lambda _, c: step3d(c, num_cg_iters=30), st
                )
            )
            float(f3(s3).density.sum())  # compile + warm
            t0 = time.perf_counter()
            float(f3(s3).density.sum())
            extra["sim3d_steps_per_sec_128cubed"] = round(
                n3 / (time.perf_counter() - t0), 1
            )
            _emit()

            # multigrid pressure solve (physics/multigrid3d.py): 2 V(2,2)
            # cycles match CG-30's residual with ~2.6x less stencil work and
            # zero global reductions
            f3mg = _j.jit(
                lambda st: _lax.fori_loop(
                    0, n3,
                    lambda _, c: step3d(c, num_cg_iters=30, pressure_solver="mg"),
                    st,
                )
            )
            float(f3mg(s3).density.sum())  # compile + warm
            t0 = time.perf_counter()
            float(f3mg(s3).density.sum())
            extra["sim3d_steps_per_sec_128cubed_mg"] = round(
                n3 / (time.perf_counter() - t0), 1
            )
            _emit()

        except Exception as e:  # pragma: no cover
            extra["sim3d_error"] = str(e)[:200]
        _done("sim3d", t_sec)
        _emit()
    if "train" in picked and not over_budget("train"):
        t_sec = time.perf_counter()
        try:
            # training-step throughput (the path that produced every committed
            # checkpoint): f32 parity recipe vs the bf16 mixed-precision path
            # (tpu.train_compute_dtype). MFU uses XLA's own FLOP count for the
            # whole fwd+bwd+AdamW program.
            _mark("train step")
            f32_ms, f32_mfu, f32_flops = bench_train_step("float32")
            extra["train_step_ms_f32"] = round(f32_ms, 2)
            if f32_mfu:
                extra["train_mfu_f32"] = round(f32_mfu, 3)
            _emit()
            bf16_ms, _, _ = bench_train_step("bfloat16", use_flash=True)
            extra["train_step_ms_bf16_flash"] = round(bf16_ms, 2)
            _emit()
            # flash variants: MFU numerator is the einsum program's FLOP
            # count (f32_flops — dtype doesn't change the count) because
            # the Pallas flash kernel's FLOPs are invisible to XLA
            # cost_analysis; the r4 train_mfu_bf16_* numbers divided by a
            # count MISSING all attention work, deflating MFU ~0.22 -> the
            # honest ~0.28
            fast_ms, fast_mfu, _ = bench_train_step(
                "bfloat16", use_flash=True, fast_math=True,
                flops_override=f32_flops,
            )
            extra["train_step_ms_bf16_flash_fast"] = round(fast_ms, 2)
            if fast_mfu:
                extra["train_mfu_bf16_flash_fast"] = round(fast_mfu, 3)
            _emit()
            # + tpu.train_rng='rbg' (r5): threefry dropout masks cost
            # 7.8 ms of this step (2.7 fwd + 5.1 bwd mask rematerialisation,
            # scripts/probe_train_hotspots.py); XLA RngBitGenerator keys
            # recover ~6.8 ms. Param init stays threefry either way.
            rbg_ms, rbg_mfu, _ = bench_train_step(
                "bfloat16", use_flash=True, fast_math=True,
                flops_override=f32_flops, rng_impl="rbg",
            )
            extra["train_step_ms_bf16_flash_fast_rbg"] = round(rbg_ms, 2)
            if rbg_mfu:
                extra["train_mfu_bf16_flash_fast_rbg"] = round(rbg_mfu, 3)
            _emit()
            # batch-32 scaling: the parity recipe's batch 8 under-fills the
            # MXU (per-step latency is memory/dispatch-bound); batch 32
            # shows the chip's training-throughput ceiling per step
            b32_ms, b32_mfu, _ = bench_train_step(
                "bfloat16", use_flash=True, fast_math=True, batch=32,
                flops_override=f32_flops * 4.0 if f32_flops else None,
            )
            extra["train_step_ms_bf16_flash_fast_b32"] = round(b32_ms, 2)
            if b32_mfu:
                extra["train_mfu_bf16_flash_fast_b32"] = round(b32_mfu, 3)
            _emit()
            # real-epoch wall time (what fit() pays: gathers + dispatch per
            # batch) vs the fused whole-epoch program (tpu.fused_epoch)
            _mark("train epoch loop vs fused")
            extra["train_epoch_ms_per_step_loop"] = round(
                bench_train_epoch("loop"), 2
            )
            _emit()
            extra["train_epoch_ms_per_step_fused"] = round(
                bench_train_epoch("fused"), 2
            )
            _emit()
            # host-resident data paths (VERDICT r4 next #8): the per-batch
            # host loop (the 87 ms/step r3 measurement) vs the staged
            # whole-epoch program (one put + one dispatch per epoch)
            _mark("train epoch host loop vs staged")
            extra["train_epoch_ms_per_step_host_loop"] = round(
                bench_train_epoch("host_loop"), 2
            )
            _emit()
            extra["train_epoch_ms_per_step_host_staged"] = round(
                bench_train_epoch("host_staged"), 2
            )
        except Exception as e:  # pragma: no cover
            extra["train_step_error"] = str(e)[:200]
        _done("train", t_sec)
        _emit()
    if "streaming" in picked and not over_budget("streaming"):
        t_sec = time.perf_counter()
        try:
            _mark("streaming")
            extra["streaming_fps_1024"] = round(bench_streaming(), 1)
            _emit()
            extra["streaming_fps_1024_flash_fast"] = round(
                bench_streaming(use_flash=True, fast_math=True), 1
            )
            _emit()
            # + pool-first encoder (tpu.fast_encoder, documented divergence):
            # skips the ~154 GFLOP full-res enc_conv2 that dominates the frame
            extra["streaming_fps_1024_fast_encoder"] = round(
                bench_streaming(use_flash=True, fast_math=True,
                                fast_encoder=True), 1
            )
        except Exception as e:  # pragma: no cover
            extra["streaming_error"] = str(e)[:200]
        _done("streaming", t_sec)
        _emit()

    extra["total_s"] = round(time.perf_counter() - _T0, 1)
    _emit()


if __name__ == "__main__":
    main()
