#!/usr/bin/env python
"""SmokePhysAI-TPU inference CLI.

Flag/flow parity with reference inference.py:111-148: generate a 20-frame
test sequence from 3 fixed sources, predict next frames + physics features,
save ground_truth.png / predictions.png / physics_features.png /
comparison.png.

TPU-native difference: the reference runs a batch-1 eager forward per frame
with host round-trips each step — its 610.92 ms/frame hot path
(inference.py:52-73). Here the whole simulated sequence stays on device and
all frames are predicted in ONE jitted batched forward.
"""
import argparse

import numpy as np


# fixed test scenario (reference inference.py:39-42)
TEST_POSITIONS = [(64, 64), (32, 32), (96, 96)]
TEST_INTENSITIES = [1.5, 1.0, 0.8]


def generate_test_sequence(simulator, sequence_length=20):
    """reference inference.py:35-50, kept on device."""
    simulator.reset()
    simulator.add_incense_source(TEST_POSITIONS, TEST_INTENSITIES)
    return [simulator.simulate_step() for _ in range(sequence_length)]


def main():
    from smokephysai_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    parser = argparse.ArgumentParser(description="SmokePhysAI-TPU Inference")
    parser.add_argument("--config", type=str, default="config/config.yaml")
    parser.add_argument("--checkpoint", type=str, required=True)
    parser.add_argument(
        "--save_attention", action="store_true",
        help="also save attention_maps.png (layer-0 attention probs on the "
        "first input frame). Wires SmokeVisualizer.plot_attention_maps, "
        "which is dead code in the reference (visualization.py:74-116).",
    )
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import matplotlib.pyplot as plt

    from smokephysai_tpu.physics.simulator import SmokeSimulator
    from smokephysai_tpu.train.serving import load_model, make_predictor
    from smokephysai_tpu.utils.config import load_config
    from smokephysai_tpu.utils.visualization import SmokeVisualizer

    config = load_config(args.config)
    print(f"Using devices: {jax.devices()}")

    model, variables = load_model(config, args.checkpoint)
    predict = make_predictor(model, variables, chaos_seed=config["tpu"]["seed"])

    simulator = SmokeSimulator(
        grid_size=tuple(config["simulation"]["grid_size"]),
        dt=config["simulation"]["dt"],
        viscosity=config["simulation"]["viscosity"],
        use_pallas=config["tpu"]["use_pallas"],
        vorticity_eps=config["tpu"]["vorticity_eps"],
    )
    sequence = generate_test_sequence(simulator, sequence_length=20)

    # one fused batched forward over all input frames (vs per-frame eager)
    inputs = jnp.stack(sequence[:-1])[..., None]  # [T-1, H, W, 1]
    outputs = predict(inputs)
    predictions = np.asarray(outputs["reconstructed"][..., 0])
    physics_features = np.asarray(outputs["physics_features"])

    ground_truth = [np.asarray(f) for f in sequence]
    visualizer = SmokeVisualizer(figsize=(15, 10))
    visualizer.plot_smoke_evolution(ground_truth[1:], save_path="ground_truth.png")
    visualizer.plot_smoke_evolution(list(predictions), save_path="predictions.png")
    visualizer.plot_chaos_features(
        {
            "lyapunov_exponent": physics_features[:, 0].tolist(),
            "fractal_dimension": physics_features[:, 1].tolist(),
            "entropy": physics_features[:, 2].tolist(),
        },
        save_path="physics_features.png",
    )

    if args.save_attention:
        # capture layer-0 attention probs via the 'intermediates' collection
        # (chaos_attention.py sows them on the einsum path only — the flash
        # kernel's online softmax never materialises the [L, L] matrix, so
        # force the parity attention for this one diagnostic forward)
        attn_model = model.clone(use_flash=False, ring_axis=None)
        x0 = inputs[:1]
        _, state = attn_model.apply(
            variables, x0, False, False,
            mutable=["intermediates"],
            rngs={"chaos": jax.random.PRNGKey(config["tpu"]["seed"])},
        )
        attn_w = state["intermediates"]["layer_0"]["chaos_attention"][
            "attn_weights"
        ][0]
        visualizer.plot_attention_maps(
            attn_w, np.asarray(x0), save_path="attention_maps.png"
        )

    # comparison triptych (reference inference.py:93-109)
    fig, axes = plt.subplots(2, 3, figsize=(18, 12))
    frame_indices = [0, len(predictions) // 2, len(predictions) - 1]
    for i, idx in enumerate(frame_indices):
        axes[0, i].imshow(ground_truth[idx + 1], cmap="hot")
        axes[0, i].set_title(f"Ground Truth Frame {idx + 1}")
        axes[0, i].axis("off")
        axes[1, i].imshow(predictions[idx], cmap="hot")
        axes[1, i].set_title(f"Predicted Frame {idx + 1}")
        axes[1, i].axis("off")
    plt.tight_layout()
    plt.savefig("comparison.png", dpi=150)

    print("Visualization results have been saved to current directory")


if __name__ == "__main__":
    main()
