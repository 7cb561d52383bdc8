#!/usr/bin/env python
"""SmokePhysAI-TPU evaluation CLI: robustness + perturbation test suite.

Exposes the L3 evaluation layer (eval/robustness.py, eval/perturbation.py —
re-designs of reference src/evaluation/robustness_metrics.py:9-103 and
perturbation_tests.py:8-143, which no reference CLI ever imports) as a
runnable report:

  python evaluate.py --checkpoint checkpoints/smokephysnet_128_best.npz \
      [--config config/config.yaml] [--num_samples 50] \
      [--output evaluation_results.json]

Report sections:
  physics_consistency   per-feature MAE of predicted chaos features
  reconstruction        SSIM / PSNR / MSE vs next-frame targets
  gaussian_noise        latent cosine stability + recon MSE per noise level
  adversarial           PGD feature stability + perturbation norm
  physics_perturbation  prediction stability over random sim scenarios
"""
import argparse
import json


def run_evaluation(
    config: dict,
    checkpoint: str,
    num_samples: int = 50,
    num_physics_tests: int = 50,
    partial_path: str = None,
    sections: set = None,
) -> dict:
    """Build the full robustness/perturbation report for a checkpoint.

    When `partial_path` is given the report-so-far is written there after
    every completed section (with ``"partial": true`` until the run
    finishes), so a wall-clock kill mid-suite still publishes the
    completed stages — the 3D volumetric runs take over an hour through
    the tunnel and one already died at stage 3/5 with nothing emitted.

    `sections` restricts the report to a subset of
    {physics_consistency, reconstruction, gaussian_noise, adversarial,
    physics_perturbation} — a targeted re-measure (e.g. the noise sweep
    on a noise-augmented 3D checkpoint) costs minutes instead of the
    full volumetric hour."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from smokephysai_tpu.data.synthetic import SyntheticSmokeDataset
    from smokephysai_tpu.eval.perturbation import PerturbationTester
    from smokephysai_tpu.eval.robustness import RobustnessEvaluator
    from smokephysai_tpu.train.serving import load_model, make_predictor

    import time

    t_start = time.time()

    def _stage(name):
        print(f"[evaluate] {name} @ {time.time() - t_start:.0f}s", flush=True)

    grid_size = tuple(config["data"]["grid_size"])
    model, variables = load_model(config, checkpoint)
    predict = make_predictor(model, variables, chaos_seed=config["tpu"].get("seed", 0))

    # Held-out episodes: same generator as training/benchmark val splits but
    # a distinct seed stream (seed+2; val uses seed+1 in create_data_loaders).
    if len(grid_size) == 3:
        # volumetric branch (3D protocol defined in PARITY.md): same report
        # sections over [N, D, H, W, 1] volumes, slicewise SSIM
        from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D

        _stage("generate 3D episodes")
        ds3 = SyntheticSmokeDataset3D(
            num_samples=num_samples,
            grid_size=grid_size,
            sequence_length=config["data"]["sequence_length"],
            seed=config["tpu"].get("seed", 0) + 2,
        )
        t = config["data"]["sequence_length"] // 2
        seqs = np.asarray(ds3._sequences)  # [N, T, D, H, W]
        chaos = np.asarray(ds3._chaos)
        # one 50x128^3 predict batch materialises ~27 GB of encoder
        # activations (past v5e HBM): inference sections run through a
        # chunked predictor; the PGD test chunks internally (grad can't
        # flow through the chunk wrapper's host concatenation)
        from smokephysai_tpu.train.serving import make_chunked_predictor

        grad_chunk = max(1, (4 * 64**3) // int(np.prod(grid_size)) + 1)
        raw_predict, predict = predict, make_chunked_predictor(
            predict, grad_chunk
        )
    else:
        _stage("generate episodes")
        ds = SyntheticSmokeDataset(
            num_samples=num_samples,
            grid_size=grid_size,
            sequence_length=config["data"]["sequence_length"],
            seed=config["tpu"].get("seed", 0) + 2,
            use_pallas=config["tpu"].get("use_pallas", False),
            vorticity_eps=config["tpu"].get("vorticity_eps", 0.0),
        )
        t = config["data"]["sequence_length"] // 2
        seqs = np.asarray(ds.data["sequences"])  # [N, T, H, W]
        chaos = np.asarray(ds.data["chaos"])  # [N, 3] lyap/fractal/entropy
        raw_predict, grad_chunk = predict, None  # 2D fits in one batch
    # one mid-sequence frame per episode, next frame as target
    inputs = jnp.asarray(seqs[:, t][..., None])  # NHWC / NDHWC
    targets = jnp.asarray(seqs[:, t + 1][..., None])

    report = {}

    def _flush_partial():
        if partial_path:
            with open(partial_path, "w") as f:
                json.dump({"partial": True, **report}, f, indent=2)

    def _want(name):
        return sections is None or name in sections

    evaluator = RobustnessEvaluator()
    if _want("physics_consistency"):
        _stage("physics consistency")
        report["physics_consistency"] = evaluator.evaluate_physics_consistency(
        predict, inputs,
            {
                "lyapunov": chaos[:, 0],
                "fractal_dimension": chaos[:, 1],
                "entropy": chaos[:, 2],
            },
        )
        _flush_partial()
    if _want("reconstruction"):
        _stage("reconstruction quality")
        report["reconstruction"] = evaluator.evaluate_reconstruction_quality(
            predict, inputs, targets
        )
        _flush_partial()

    tester = PerturbationTester()
    if _want("gaussian_noise"):
        _stage("gaussian noise")
        report["gaussian_noise"] = tester.gaussian_noise_test(
            predict, inputs,
            key=jax.random.PRNGKey(config["tpu"].get("seed", 0)),
        )
        _flush_partial()
    if _want("adversarial"):
        _stage("adversarial (PGD)")
        report["adversarial"] = tester.adversarial_test(
            raw_predict, inputs, chunk_size=grad_chunk
        )
        _flush_partial()
    if _want("physics_perturbation"):
        _stage("physics perturbation scenarios")
        report["physics_perturbation"] = tester.physics_perturbation_test(
            raw_predict,
            grid_size=grid_size,
            num_tests=num_physics_tests,
            num_steps=config["data"]["sequence_length"],
            key=jax.random.PRNGKey(config["tpu"].get("seed", 0) + 3),
            dt=config["simulation"]["dt"],
            viscosity=config["simulation"]["viscosity"],
        )
    _stage("done")
    return report


def main():
    from smokephysai_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description="SmokePhysAI-TPU Evaluation")
    parser.add_argument("--config", type=str, default="config/config.yaml")
    parser.add_argument(
        "--checkpoint", type=str, required=True,
        help="Experiment dir (Orbax) or .npz checkpoint export",
    )
    parser.add_argument(
        "--num_samples", type=int, default=50,
        help="Evaluation episodes to generate",
    )
    parser.add_argument(
        "--num_physics_tests", type=int, default=50,
        help="Random sim scenarios for the physics stability test "
        "(reference perturbation_tests.py:99)",
    )
    parser.add_argument(
        "--output", type=str, default="evaluation_results.json",
        help="Where to write the JSON report",
    )
    parser.add_argument(
        "--sections", type=str, default="all",
        help="comma-separated subset of physics_consistency,reconstruction,"
        "gaussian_noise,adversarial,physics_perturbation (default: all) — "
        "targeted re-measures instead of the full volumetric hour",
    )
    args = parser.parse_args()

    import jax

    from smokephysai_tpu.utils.config import load_config

    config = load_config(args.config)
    print(f"Using devices: {jax.devices()}")

    report = run_evaluation(
        config, args.checkpoint, args.num_samples, args.num_physics_tests,
        partial_path=args.output,
        sections=(
            None if args.sections == "all" else set(args.sections.split(","))
        ),
    )

    print(json.dumps(report, indent=2))
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(f"Report written to {args.output}")


if __name__ == "__main__":
    main()
