#!/usr/bin/env python
"""SmokePhysAI-TPU benchmark CLI: model vs classical optical-flow baselines.

Protocol parity with reference benchmark.py:236-275: --config/--checkpoint/
--num_samples (default 50), batch size 4, model MSE on normalised tensors,
per-sample Pearson correlation over the 3 chaos features, wall-clock
per-sample timing; Farneback and Lucas-Kanade baselines computed on uint8
frames with cv2 and warp-prediction via remap. The mixed MSE scales
(model [0,1] vs CV 0-255) are the reference's protocol, reproduced as-is
and documented (BASELINE.md caveat).
"""
import argparse
import time

import numpy as np


def farneback_flow(prev_gray, next_gray):
    """Dense Farneback flow, reference parameter set (benchmark.py:36-38)."""
    import cv2

    return cv2.calcOpticalFlowFarneback(
        prev_gray, next_gray, None, 0.5, 3, 15, 3, 5, 1.2, 0
    )


def lucas_kanade_flow(prev_gray, next_gray):
    """Sparse LK flow scattered into a dense field
    (reference benchmark.py:41-78)."""
    import cv2

    p0 = cv2.goodFeaturesToTrack(
        prev_gray, mask=None, maxCorners=100, qualityLevel=0.3,
        minDistance=7, blockSize=7,
    )
    flow = np.zeros((*prev_gray.shape, 2), dtype=np.float32)
    if p0 is None:
        return flow
    p1, st, _ = cv2.calcOpticalFlowPyrLK(
        prev_gray, next_gray, p0, None, winSize=(15, 15), maxLevel=2
    )
    if p1 is not None:
        for new, old in zip(p1[st == 1], p0[st == 1]):
            x0, y0 = old.ravel()
            x1, y1 = new.ravel()
            flow[int(y0), int(x0)] = [x1 - x0, y1 - y0]
    return flow


def warp_with_flow(prev_gray, flow):
    """Flow-warp prediction of the next frame (reference benchmark.py:80-94)."""
    import cv2

    h, w = prev_gray.shape[:2]
    map_x = (np.tile(np.arange(w), (h, 1)) + flow[..., 0]).astype(np.float32)
    map_y = (
        np.tile(np.arange(h), (w, 1)).T + flow[..., 1]
    ).astype(np.float32)
    return cv2.remap(prev_gray, map_x, map_y, interpolation=cv2.INTER_LINEAR)


def evaluate_model(predict, batches):
    """MSE / physics correlation / per-sample latency
    (reference benchmark.py:116-159)."""
    import jax
    import jax.numpy as jnp

    from smokephysai_tpu.train.metrics import pearson_per_sample

    total_mse, total_time, n_batches, n_samples = 0.0, 0.0, 0, 0
    corrs = []
    seen_shapes = set()
    for batch in batches:
        inputs = batch["input"]
        # compile happens per distinct batch shape (e.g. the trailing
        # partial batch); keep compilation out of the timed region
        if inputs.shape not in seen_shapes:
            float(jnp.sum(predict(inputs)["reconstructed"]))
            seen_shapes.add(inputs.shape)
        start = time.time()
        outputs = predict(inputs)
        # scalar readback, not block_until_ready: the latter intermittently
        # returns early through the axon TPU tunnel (CLAUDE.md timing trap)
        float(jnp.sum(outputs["reconstructed"]))
        total_time += time.time() - start

        total_mse += float(jnp.mean((outputs["reconstructed"] - batch["target"]) ** 2))
        corrs.extend(
            np.asarray(
                pearson_per_sample(
                    outputs["physics_features"], batch["chaos_features"]
                )
            ).tolist()
        )
        n_batches += 1
        n_samples += inputs.shape[0]

    return {
        "mse": total_mse / max(n_batches, 1),
        "physics_correlation": float(np.mean(corrs)) if corrs else float("nan"),
        "inference_time": total_time / max(n_samples, 1),
    }


def evaluate_traditional_cv(batches):
    """uint8-space optical-flow baselines (reference benchmark.py:161-211)."""
    results = {
        "Farneback": {"mse": [], "time": []},
        "Lucas-Kanade": {"mse": [], "time": []},
    }
    for batch in batches:
        prev_frames = (np.asarray(batch["input"][..., 0]) * 255).astype(np.uint8)
        next_frames = (np.asarray(batch["target"][..., 0]) * 255).astype(np.uint8)
        for prev_gray, next_gray in zip(prev_frames, next_frames):
            t0 = time.time()
            pred_fb = warp_with_flow(prev_gray, farneback_flow(prev_gray, next_gray))
            t_fb = time.time() - t0

            t0 = time.time()
            pred_lk = warp_with_flow(
                prev_gray, lucas_kanade_flow(prev_gray, next_gray)
            )
            t_lk = time.time() - t0

            results["Farneback"]["mse"].append(
                float(np.mean((next_gray.astype(np.float64) - pred_fb) ** 2))
            )
            results["Farneback"]["time"].append(t_fb)
            results["Lucas-Kanade"]["mse"].append(
                float(np.mean((next_gray.astype(np.float64) - pred_lk) ** 2))
            )
            results["Lucas-Kanade"]["time"].append(t_lk)

    return {
        name: {
            "mse": float(np.mean(r["mse"])),
            "inference_time": float(np.mean(r["time"])),
        }
        for name, r in results.items()
    }


def evaluate_traditional_cv3d(batches):
    """Volumetric CV baselines (protocol defined in PARITY.md — the
    reference benchmark.py:161-211 is 2D-only, so there is no torch-side
    analog): per-z-slice Farneback flow + warp (the 2D baseline applied
    slicewise, the standard volumetric extension of dense optical flow) and
    persistence (next volume = current volume), both on uint8 0-255 voxels
    to match the reference's mixed-scale convention."""
    results = {
        "Farneback-slice": {"mse": [], "time": []},
        "Persistence": {"mse": [], "time": []},
    }
    for batch in batches:
        prev_vols = (np.asarray(batch["input"][..., 0]) * 255).astype(np.uint8)
        next_vols = (np.asarray(batch["target"][..., 0]) * 255).astype(np.uint8)
        for prev, nxt in zip(prev_vols, next_vols):  # [D, H, W]
            t0 = time.time()
            pred = np.stack(
                [
                    warp_with_flow(p, farneback_flow(p, n))
                    for p, n in zip(prev, nxt)
                ]
            )
            results["Farneback-slice"]["time"].append(time.time() - t0)
            results["Farneback-slice"]["mse"].append(
                float(np.mean((nxt.astype(np.float64) - pred) ** 2))
            )
            results["Persistence"]["time"].append(0.0)
            results["Persistence"]["mse"].append(
                float(
                    np.mean(
                        (nxt.astype(np.float64) - prev.astype(np.float64)) ** 2
                    )
                )
            )
    return {
        name: {
            "mse": float(np.mean(r["mse"])),
            "inference_time": float(np.mean(r["time"])),
        }
        for name, r in results.items()
    }


def print_results(model_results, cv_results):
    """Fixed-width results table (reference benchmark.py:213-234)."""
    print("\n" + "=" * 60)
    print(
        f"{'Model':<20} | {'MSE':<15} | {'Physics Corr':<15} | "
        f"{'Inference Time (ms)':<15}"
    )
    print("-" * 60)
    print(
        f"{'SmokePhysAI-TPU':<20} | {model_results['mse']:.6f} | "
        f"{model_results['physics_correlation']:.4f} | "
        f"{model_results['inference_time'] * 1000:.2f}"
    )
    for method, r in cv_results.items():
        print(
            f"{method:<20} | {r['mse']:.6f} | {'N/A':<15} | "
            f"{r['inference_time'] * 1000:.2f}"
        )
    print("=" * 60)
    print("Note: Physics Correlation measures prediction of chaos features")
    print("      (Lyapunov exponent, Fractal dimension, Entropy) vs ground truth")
    print("Note: model MSE is on normalised [0,1] tensors; CV MSE on uint8")
    print("      0-255 frames — the reference's mixed-scale protocol.")


def main():
    from smokephysai_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description="SmokePhysAI-TPU Benchmark")
    parser.add_argument("--config", type=str, default="config/config.yaml")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument("--num_samples", type=int, default=50)
    parser.add_argument(
        "--set", action="append", default=[], metavar="SEC.KEY=VAL",
        help="Config override, e.g. --set tpu.use_flash=false — lets one "
        "checkpoint be gated under different eval numerics (flash vs einsum "
        "attention, fast_math on/off) without a config file per combination",
    )
    args = parser.parse_args()

    import jax

    from smokephysai_tpu.data import SyntheticSmokeDataset
    from smokephysai_tpu.train.serving import load_model, make_predictor
    from smokephysai_tpu.utils.config import apply_overrides, load_config

    config = apply_overrides(load_config(args.config), args.set)
    if args.set:
        print(f"Config overrides: {args.set}")
    print(f"Using devices: {jax.devices()}")

    model, variables = load_model(config, args.checkpoint)
    predict = make_predictor(model, variables, chaos_seed=config["tpu"]["seed"])

    grid = tuple(config["data"]["grid_size"])
    volumetric = len(grid) == 3
    if volumetric:
        # 3D protocol (PARITY.md): held-out volumes, batch 1, slicewise
        # Farneback + persistence baselines
        from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D

        dataset = SyntheticSmokeDataset3D(
            num_samples=args.num_samples,
            grid_size=grid,
            sequence_length=config["data"]["sequence_length"],
            seed=config["tpu"]["seed"] + 1000,
        )
        batch_size = 1
    else:
        dataset = SyntheticSmokeDataset(
            num_samples=args.num_samples,
            grid_size=grid,
            sequence_length=config["data"]["sequence_length"],
            seed=config["tpu"]["seed"] + 1000,
            use_pallas=config["tpu"]["use_pallas"],
            vorticity_eps=config["tpu"]["vorticity_eps"],
        )
        batch_size = 4

    def batches():
        return dataset.epoch_batches(
            jax.random.PRNGKey(0), batch_size=batch_size, shuffle=False
        )

    # compile warm-up outside the timed loop
    first = next(iter(batches()))
    jax.block_until_ready(predict(first["input"])["reconstructed"])

    print("\nEvaluating SmokePhysAI-TPU model...")
    model_results = evaluate_model(predict, batches())

    print("\nEvaluating traditional computer vision methods...")
    cv_results = (
        evaluate_traditional_cv3d(batches())
        if volumetric
        else evaluate_traditional_cv(batches())
    )

    print_results(model_results, cv_results)


if __name__ == "__main__":
    main()
