#!/usr/bin/env python
"""SmokePhysAI-TPU training CLI.

Flag/flow parity with reference train.py:182-280 (--config/--resume, YAML
config, experiments/smokephys_<ts> dir, TensorBoard scalars, best-val
checkpoint) — with a working --resume and a jitted training loop.
"""
import argparse
import os
from datetime import datetime


def main():
    from smokephysai_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description="SmokePhysAI-TPU Training")
    parser.add_argument(
        "--config", type=str, default="config/config.yaml",
        help="Path to config file",
    )
    parser.add_argument(
        "--resume", type=str, default=None,
        help="Path to experiment dir or checkpoint to resume from; "
        "'auto' resumes the most recent experiment (elastic restart)",
    )
    parser.add_argument(
        "--init_from", type=str, default=None,
        help="Initialise params/batch_stats from an .npz checkpoint export "
        "(fresh optimiser state) — fine-tuning, e.g. 128^2 -> 512^2",
    )
    parser.add_argument(
        "--set", action="append", default=[], metavar="SEC.KEY=VAL",
        help="Config override, e.g. --set tpu.fast_math=false — lets one "
        "base YAML drive recipe variants (precision/epoch-split ablations) "
        "without a config file per variant",
    )
    args = parser.parse_args()

    from smokephysai_tpu.utils.config import apply_overrides, load_config
    from smokephysai_tpu.data import create_data_loaders
    from smokephysai_tpu.train.loop import fit

    config = apply_overrides(load_config(args.config), args.set)
    if args.set:
        print(f"Config overrides: {args.set}")

    if args.resume == "auto":
        from smokephysai_tpu.train.checkpoint import latest_checkpoint

        args.resume = latest_checkpoint()
        print(f"Auto-resume from: {args.resume}")

    timestamp = datetime.now().strftime("%Y%m%d_%H%M%S")
    exp_dir = os.path.join("experiments", f"smokephys_{timestamp}")
    os.makedirs(exp_dir, exist_ok=True)

    try:
        from torch.utils.tensorboard import SummaryWriter

        writer = SummaryWriter(os.path.join(exp_dir, "logs"))
    except ImportError:  # tensorboard optional
        writer = None

    import jax

    print(f"Using devices: {jax.devices()}")

    grid_size = tuple(config["data"]["grid_size"])
    if len(grid_size) == 3:  # BASELINE configs[3]: 128^3 volumetric path
        from smokephysai_tpu.data.synthetic3d import create_data_loaders3d

        train_ds, val_ds = create_data_loaders3d(
            batch_size=config["training"]["batch_size"],
            num_train=config["data"]["num_train"],
            num_val=config["data"]["num_val"],
            grid_size=grid_size,
            cache_dir=config["data"]["cache_dir"],
            sequence_length=config["data"]["sequence_length"],
            seed=config["tpu"]["seed"],
        )
    else:
        train_ds, val_ds = create_data_loaders(
            batch_size=config["training"]["batch_size"],
            num_train=config["data"]["num_train"],
            num_val=config["data"]["num_val"],
            grid_size=grid_size,
            cache_dir=config["data"]["cache_dir"],
            sequence_length=config["data"]["sequence_length"],
            seed=config["tpu"]["seed"],
            use_pallas=config["tpu"]["use_pallas"],
            vorticity_eps=config["tpu"]["vorticity_eps"],
        )

    fit(
        config,
        train_ds,
        val_ds,
        exp_dir,
        writer=writer,
        resume_from=args.resume,
        init_from=args.init_from,
    )

    print("Training completed!")
    if writer is not None:
        writer.close()


if __name__ == "__main__":
    main()
