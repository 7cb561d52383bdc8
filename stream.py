#!/usr/bin/env python
"""Streaming CLI: fused on-device sim+model rollout to disk.

User-facing entry for the streaming north-star config (BASELINE configs[4],
'Streaming 30fps 1024x1024 video' — the reference has no streaming path at
all; its inference.py hops simulator -> host numpy -> model per frame,
reference inference.py:46-71). Frames never leave HBM between the solver
step and the model forward (train/streaming.py); the host receives only the
stacked per-frame physics features and, optionally, downsampled frames.

    python stream.py --config config/config_streaming_1024.yaml \
        --checkpoint checkpoints/smokephysnet_128_best.npz \
        --frames 120 --output_dir stream_output

Writes:
  stream_output/physics_features.npy   [T, 3] chaos features per frame
  stream_output/frames.npy             [T, H/ds, W/ds] downsampled frames
  stream_output/summary.json           fps + config echo
  stream_output/evolution.png          frame-grid plot (if matplotlib)

Use --mesh_space N to run the solver domain-decomposed over N devices
(streaming_rollout_sharded) — the >4k^2 scale-out path.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    from smokephysai_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description="SmokePhysAI-TPU streaming")
    parser.add_argument("--config", type=str, default="config/config_streaming_1024.yaml")
    parser.add_argument("--checkpoint", type=str, default=None,
                        help=".npz export or Orbax dir; random init if absent")
    parser.add_argument("--frames", type=int, default=60)
    parser.add_argument("--output_dir", type=str, default="stream_output")
    parser.add_argument("--downsample", type=int, default=4,
                        help="spatial stride for saved frames (HBM->host)")
    parser.add_argument("--mesh_space", type=int, default=0,
                        help=">1: domain-decompose the sim over this many devices")
    parser.add_argument("--source_radius", type=float, default=0.0,
                        help="smoke source radius in cells (default grid/32)")
    args = parser.parse_args()

    import jax
    import numpy as np

    from smokephysai_tpu.physics import add_smoke_source, init_state
    from smokephysai_tpu.train.serving import build_model, load_model
    from smokephysai_tpu.train.streaming import (
        streaming_rollout,
        streaming_rollout_sharded,
    )
    from smokephysai_tpu.utils.config import load_config

    config = load_config(args.config)
    grid = tuple(config["simulation"]["grid_size"])

    if args.checkpoint:
        model, variables = load_model(config, args.checkpoint)
    else:
        import jax.numpy as jnp

        model = build_model(config)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
            jnp.zeros((1, grid[0], grid[1], 1), jnp.float32), train=False,
        )

    state = init_state(grid)
    state = state.replace(
        density=add_smoke_source(
            state.density, grid[1] / 2, grid[0] / 2,
            args.source_radius or max(8.0, grid[0] / 32), 1.5
        )
    )

    sim_cfg = config["simulation"]
    sim_kwargs = dict(
        dt=sim_cfg["dt"],
        viscosity=sim_cfg["viscosity"],
        num_jacobi_iters=sim_cfg.get("num_jacobi_iters", 20),
    )

    t0 = time.perf_counter()
    if args.mesh_space > 1:
        from smokephysai_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(space=args.mesh_space)
        final, outs = streaming_rollout_sharded(
            model, variables, state, num_frames=args.frames, mesh=mesh,
            **sim_kwargs,
        )
    else:
        final, outs = streaming_rollout(
            model, variables, state, num_frames=args.frames,
            use_pallas=config.get("tpu", {}).get("use_pallas", True),
            **sim_kwargs,
        )
    feats = np.asarray(outs["physics_features"])  # forces completion
    wall = time.perf_counter() - t0

    frames = np.asarray(
        outs["frame"][:, :: args.downsample, :: args.downsample]
    )

    os.makedirs(args.output_dir, exist_ok=True)
    np.save(os.path.join(args.output_dir, "physics_features.npy"), feats)
    np.save(os.path.join(args.output_dir, "frames.npy"), frames)
    summary = {
        "frames": args.frames,
        "grid": list(grid),
        "fps_including_compile": round(args.frames / wall, 2),
        "mesh_space": args.mesh_space,
        "checkpoint": args.checkpoint,
    }
    with open(os.path.join(args.output_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)

    try:
        from smokephysai_tpu.utils.visualization import SmokeVisualizer

        show = frames[:: max(1, len(frames) // 16)][:16]
        SmokeVisualizer().plot_smoke_evolution(
            list(show), save_path=os.path.join(args.output_dir, "evolution.png")
        )
    except Exception as e:  # headless/matplotlib issues shouldn't kill the run
        print(f"(skipping evolution plot: {e})")

    print(json.dumps(summary))


if __name__ == "__main__":
    main()
