"""Run the *reference's own* evaluation suite (src/evaluation/
robustness_metrics.py:9-103, perturbation_tests.py:8-143) on the torch-side
export of our trained checkpoint, next to our evaluate.py layer on the SAME
episodes — so the L3 robustness numbers in PARITY.md become a parity claim
rather than an uncontextualised report (VERDICT r2 missing #3 / weak #6).

Protocol:
  * Episodes come from OUR generator (seed+2 held-out stream, identical to
    evaluate.py) and are fed to both frameworks — same inputs, so the
    physics-consistency / reconstruction / adversarial numbers are directly
    comparable.
  * gaussian_noise draws torch RNG noise on the torch side and jax RNG noise
    on ours — same distribution, different samples (statistical comparison).
  * physics_perturbation feeds the SAME vmapped scenario sequences to both
    models (the reference's loop drives its own torch simulator; using one
    shared scenario set keeps the stability definition identical while
    making the column comparable). Reference definition: stability =
    1/(1+mean prediction variance over time).
  * The torch model re-rolls its Lorenz chaos field every forward
    (reference chaos_attention.py:50-52) while our predictor uses a fixed
    chaos key — the torch stability columns therefore carry that extra
    nondeterminism, exactly as a reference user would measure them.

Run from repo root (CPU, no TPU needed):

    python scripts/crossval_evaluation.py [checkpoint.npz] [--num_samples N]
"""
import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import torch  # noqa: E402

from smokephysai_tpu.data.synthetic import SyntheticSmokeDataset  # noqa: E402
from smokephysai_tpu.eval.perturbation import PerturbationTester  # noqa: E402
from smokephysai_tpu.eval.robustness import RobustnessEvaluator  # noqa: E402
from smokephysai_tpu.models.torch_port import export_torch_state_dict  # noqa: E402
from smokephysai_tpu.train.serving import (  # noqa: E402
    _load_npz_variables, build_model, make_predictor,
)
from smokephysai_tpu.utils.config import load_config  # noqa: E402

from src.evaluation.robustness_metrics import (  # noqa: E402
    RobustnessEvaluator as TorchRobustness,
)
from src.evaluation.perturbation_tests import (  # noqa: E402
    PerturbationTester as TorchPerturbation,
)
from src.models.smokephys_net import SmokePhysNet as TorchNet  # noqa: E402


def load_torch_model(variables):
    tmodel = TorchNet()
    sd = export_torch_state_dict(variables)
    missing, unexpected = tmodel.load_state_dict(
        {k: torch.from_numpy(v) for k, v in sd.items()}, strict=False
    )
    assert not unexpected, unexpected
    assert all(
        "num_batches_tracked" in k or "lorenz_" in k for k in missing
    ), missing
    tmodel.eval()
    return tmodel


def torch_physics_stability(tmodel, seqs):
    """Reference perturbation_tests.py:96-143's stability definition on a
    shared scenario set: per-frame physics features, variance over time."""
    variances = []
    with torch.no_grad():
        for ep in seqs:  # [T, H, W]
            frames = torch.from_numpy(ep[:, None]).float()  # [T,1,H,W]
            feats = tmodel(frames)["physics_features"]  # [T, 3]
            variances.append(float(torch.var(feats, dim=0).mean()))
    avg = float(np.mean(variances))
    return {"physics_prediction_stability": 1.0 / (1.0 + avg)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint", nargs="?",
                    default="checkpoints/smokephysnet_128_best.npz")
    ap.add_argument("--config", default="config/config.yaml")
    ap.add_argument("--num_samples", type=int, default=50)
    ap.add_argument("--num_physics_tests", type=int, default=20)
    ap.add_argument("--output", default="crossval_evaluation.json")
    args = ap.parse_args()

    config = load_config(args.config)
    grid = tuple(config["data"]["grid_size"])
    variables = _load_npz_variables(args.checkpoint)

    # ---- shared held-out episodes (same stream as evaluate.py) ----
    ds = SyntheticSmokeDataset(
        num_samples=args.num_samples,
        grid_size=grid,
        sequence_length=config["data"]["sequence_length"],
        seed=config["tpu"].get("seed", 0) + 2,
        use_pallas=False,
    )
    t = config["data"]["sequence_length"] // 2
    seqs = np.asarray(ds.data["sequences"], np.float32)  # [N, T, H, W]
    chaos = np.asarray(ds.data["chaos"], np.float32)
    inputs_j = jnp.asarray(seqs[:, t][..., None])
    targets_j = jnp.asarray(seqs[:, t + 1][..., None])
    inputs_t = torch.from_numpy(seqs[:, t][:, None])  # NCHW
    targets_t = torch.from_numpy(seqs[:, t + 1][:, None])
    phys_targets_np = {
        "lyapunov": chaos[:, 0],
        "fractal_dimension": chaos[:, 1],
        "entropy": chaos[:, 2],
    }

    # ---- ours ----
    model = build_model(config)
    predict = make_predictor(
        model, variables, chaos_seed=config["tpu"].get("seed", 0)
    )
    ours = {}
    print("[crossval] ours: consistency/recon", file=sys.stderr, flush=True)
    ev = RobustnessEvaluator()
    ours["physics_consistency"] = ev.evaluate_physics_consistency(
        predict, inputs_j, phys_targets_np
    )
    ours["reconstruction"] = ev.evaluate_reconstruction_quality(
        predict, inputs_j, targets_j
    )
    tester = PerturbationTester()
    print("[crossval] ours: gaussian", file=sys.stderr, flush=True)
    ours["gaussian_noise"] = tester.gaussian_noise_test(
        predict, inputs_j, key=jax.random.PRNGKey(0)
    )
    print("[crossval] ours: PGD", file=sys.stderr, flush=True)
    ours["adversarial"] = tester.adversarial_test(predict, inputs_j)

    # ---- reference (torch) on the export ----
    print("[crossval] torch: load", file=sys.stderr, flush=True)
    tmodel = load_torch_model(variables)
    theirs = {}
    tev = TorchRobustness(device="cpu")
    theirs["physics_consistency"] = tev.evaluate_physics_consistency(
        tmodel, inputs_t,
        {k: torch.from_numpy(v) for k, v in phys_targets_np.items()},
    )
    theirs["reconstruction"] = tev.evaluate_reconstruction_quality(
        tmodel, inputs_t, targets_t
    )
    ttester = TorchPerturbation(device="cpu")
    torch.manual_seed(0)
    print("[crossval] torch: gaussian", file=sys.stderr, flush=True)
    theirs["gaussian_noise"] = ttester.gaussian_noise_test(tmodel, inputs_t)
    print("[crossval] torch: PGD", file=sys.stderr, flush=True)
    theirs["adversarial"] = ttester.adversarial_test(tmodel, inputs_t)

    # ---- shared-scenario physics stability ----
    from smokephysai_tpu.data.synthetic import sample_source_params
    from smokephysai_tpu.physics.simulator import simulate_episode

    params = sample_source_params(
        jax.random.PRNGKey(config["tpu"].get("seed", 0) + 3),
        args.num_physics_tests, grid,
    )
    print("[crossval] scenarios", file=sys.stderr, flush=True)
    scen, _ = jax.vmap(
        lambda xy, inten, act: simulate_episode(
            xy, inten, act, grid_size=grid,
            num_steps=config["data"]["sequence_length"],
            dt=config["simulation"]["dt"],
            viscosity=config["simulation"]["viscosity"],
        )
    )(params["xy"], params["intensity"], params["active"])
    scen = np.asarray(scen, np.float32)  # [N, T, H, W]
    N, T, H, W = scen.shape
    feats = predict(scen.reshape(N * T, H, W, 1))["physics_features"]
    var = jnp.mean(jnp.var(feats.reshape(N, T, 3), axis=1))
    ours["physics_perturbation"] = {
        "physics_prediction_stability": float(1.0 / (1.0 + var))
    }
    theirs["physics_perturbation"] = torch_physics_stability(tmodel, scen)

    report = {
        "checkpoint": args.checkpoint,
        "num_samples": args.num_samples,
        "num_physics_tests": args.num_physics_tests,
        "smokephysai_tpu": ours,
        "reference_torch": theirs,
    }
    print(json.dumps(report, indent=2))

    def flat(d, prefix=""):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                out.update(flat(v, f"{prefix}{k}."))
            else:
                out[f"{prefix}{k}"] = v
        return out

    fo, ft = flat(ours), flat(theirs)
    print(f"\n{'metric':<44} {'tpu':>12} {'reference':>12}")
    print("-" * 70)
    for k in fo:
        if k in ft:
            print(f"{k:<44} {fo[k]:>12.6f} {ft[k]:>12.6f}")
    with open(args.output, "w") as f:
        json.dump(report, f, indent=2)
    print(f"\nwrote {args.output}")


if __name__ == "__main__":
    main()
