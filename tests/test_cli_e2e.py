"""End-to-end slice test (SURVEY.md §7 'minimum end-to-end slice'):
generate data -> fit 2 epochs -> checkpoint -> reload for serving ->
benchmark-style eval incl. CV baselines."""
import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from smokephysai_tpu.data import SyntheticSmokeDataset
from smokephysai_tpu.train.loop import fit
from smokephysai_tpu.train.serving import load_model, make_predictor

CONFIG = {
    "data": {"grid_size": [64, 64], "sequence_length": 20,
             "num_train": 4, "num_val": 2, "cache_dir": None},
    "model": {
        "input_dim": 32,
        "hidden_dim": 64,
        "num_layers": 1,
        "num_heads": 4,
        "output_channels": 16,
        "chaos_strength": 0.1,
    },
    "physics": {
        "conservation_weight": 1.0,
        "continuity_weight": 1.0,
        "energy_weight": 0.5,
    },
    "training": {
        "batch_size": 2,
        "num_epochs": 2,
        "learning_rate": 1e-3,
        "weight_decay": 0.01,
    },
    "simulation": {"dt": 0.01, "viscosity": 0.001, "grid_size": [64, 64]},
    "tpu": {"seed": 0, "use_pallas": False},
}


@pytest.fixture(scope="module")
def trained_exp_dir(tmp_path_factory):
    exp_dir = str(tmp_path_factory.mktemp("exp"))
    train_ds = SyntheticSmokeDataset(
        num_samples=4, grid_size=(64, 64), sequence_length=20, seed=0
    )
    val_ds = SyntheticSmokeDataset(
        num_samples=2, grid_size=(64, 64), sequence_length=20, seed=1
    )
    fit(CONFIG, train_ds, val_ds, exp_dir, writer=None, print_fn=lambda *a: None)
    return exp_dir, val_ds


def test_fit_saves_checkpoint(trained_exp_dir):
    exp_dir, _ = trained_exp_dir
    assert os.path.isdir(os.path.join(exp_dir, "best_model"))
    assert os.path.exists(os.path.join(exp_dir, "meta.json"))


def test_fit_saves_last_model(trained_exp_dir):
    """fit() also writes last_model (the FINAL state — what a two-phase
    recipe's --init_from needs) next to the best-val checkpoint, and it
    restores as a direct Orbax dir path through load_model."""
    exp_dir, _ = trained_exp_dir
    last = os.path.join(exp_dir, "last_model")
    assert os.path.isdir(last)
    assert os.path.exists(os.path.join(exp_dir, "last_model_meta.json"))
    _, variables = load_model(CONFIG, last)
    assert "params" in variables and "batch_stats" in variables


def test_resume_from_checkpoint(trained_exp_dir):
    exp_dir, val_ds = trained_exp_dir
    train_ds = SyntheticSmokeDataset(
        num_samples=4, grid_size=(64, 64), sequence_length=20, seed=0
    )
    cfg = {**CONFIG, "training": {**CONFIG["training"], "num_epochs": 3}}
    state = fit(
        cfg, train_ds, val_ds, exp_dir, writer=None,
        resume_from=exp_dir, print_fn=lambda *a: None,
    )
    assert int(state.epoch) >= 1


def test_serving_reload_and_predict(trained_exp_dir):
    exp_dir, val_ds = trained_exp_dir
    model, variables = load_model(CONFIG, exp_dir)
    predict = make_predictor(model, variables)
    batch = val_ds.sample_batch(jax.random.PRNGKey(0), 2)
    out = predict(batch["input"])
    assert out["reconstructed"].shape == (2, 64, 64, 1)
    assert np.isfinite(np.asarray(out["reconstructed"])).all()
    # determinism: fixed chaos key -> identical predictions
    out2 = predict(batch["input"])
    np.testing.assert_array_equal(
        np.asarray(out["reconstructed"]), np.asarray(out2["reconstructed"])
    )


def test_benchmark_protocol(trained_exp_dir):
    exp_dir, val_ds = trained_exp_dir
    import benchmark as bench_cli

    model, variables = load_model(CONFIG, exp_dir)
    predict = make_predictor(model, variables)
    batches = list(val_ds.epoch_batches(jax.random.PRNGKey(0), 2, shuffle=False))
    mres = bench_cli.evaluate_model(predict, batches)
    assert set(mres) == {"mse", "physics_correlation", "inference_time"}
    assert np.isfinite(mres["mse"])

    cvres = bench_cli.evaluate_traditional_cv(batches)
    assert "Farneback" in cvres and "Lucas-Kanade" in cvres
    assert np.isfinite(cvres["Farneback"]["mse"])
    bench_cli.print_results(mres, cvres)  # table renders without error


def test_inference_visualization(trained_exp_dir, tmp_path, monkeypatch):
    exp_dir, _ = trained_exp_dir
    monkeypatch.chdir(tmp_path)
    from smokephysai_tpu.physics.simulator import SmokeSimulator
    from smokephysai_tpu.utils.visualization import SmokeVisualizer
    import inference as inf_cli

    sim = SmokeSimulator(grid_size=(64, 64))
    sim.add_incense_source([(32, 32)], [1.0])
    seq = [np.asarray(sim.simulate_step()) for _ in range(4)]

    viz = SmokeVisualizer()
    viz.plot_smoke_evolution(seq, save_path=str(tmp_path / "evo.png"))
    viz.plot_chaos_features(
        {"lyapunov_exponent": [0.1, 0.2], "fractal_dimension": [1.1, 1.2],
         "entropy": [0.5, 0.6]},
        save_path=str(tmp_path / "chaos.png"),
    )
    assert (tmp_path / "evo.png").exists()
    assert (tmp_path / "chaos.png").exists()
    assert inf_cli.TEST_POSITIONS == [(64, 64), (32, 32), (96, 96)]


def test_fit_on_dp_tp_mesh(tmp_path):
    """fit() with tpu.data_axis/model_axis >1 trains on the virtual mesh."""
    import jax

    if len(jax.devices()) < 4:
        import pytest

        pytest.skip("needs 4 virtual devices")
    cfg = {
        **CONFIG,
        "training": {**CONFIG["training"], "num_epochs": 1, "batch_size": 2},
        "tpu": {"seed": 0, "use_pallas": False, "data_axis": 2, "model_axis": 2},
    }
    train_ds = SyntheticSmokeDataset(
        num_samples=4, grid_size=(64, 64), sequence_length=20, seed=0
    )
    val_ds = SyntheticSmokeDataset(
        num_samples=2, grid_size=(64, 64), sequence_length=20, seed=1
    )
    state = fit(cfg, train_ds, val_ds, str(tmp_path), writer=None,
                print_fn=lambda *a: None)
    import numpy as np

    assert np.isfinite(
        float(np.asarray(jax.tree_util.tree_leaves(state.params)[0]).sum())
    )


def test_attention_map_visualization(tmp_path):
    from smokephysai_tpu.utils.visualization import SmokeVisualizer
    import numpy as _np

    viz = SmokeVisualizer()
    attn = _np.random.default_rng(0).random((1, 4, 16, 16)).astype(_np.float32)
    img = _np.random.default_rng(1).random((1, 8, 8, 1)).astype(_np.float32)
    viz.plot_attention_maps(attn, img, save_path=str(tmp_path / "attn.png"))
    assert (tmp_path / "attn.png").exists()


def test_attention_capture_e2e(trained_exp_dir, tmp_path):
    """inference.py --save_attention path: layer-0 attention probs come out
    of the model via the 'intermediates' collection (chaos_attention.py sow)
    and render through plot_attention_maps."""
    import jax.numpy as jnp
    from smokephysai_tpu.utils.visualization import SmokeVisualizer

    exp_dir, _ = trained_exp_dir
    model, variables = load_model(CONFIG, exp_dir)
    x0 = jnp.ones((1, 64, 64, 1)) * 0.3
    attn_model = model.clone(use_flash=False, ring_axis=None)
    out, state = attn_model.apply(
        variables, x0, False, False,
        mutable=["intermediates"],
        rngs={"chaos": jax.random.PRNGKey(0)},
    )
    attn_w = state["intermediates"]["layer_0"]["chaos_attention"][
        "attn_weights"
    ][0]
    B, h, L, _ = attn_w.shape
    assert (B, h, L) == (1, 4, 1024)
    # rows are softmax distributions
    np.testing.assert_allclose(
        np.asarray(attn_w.sum(-1)), np.ones((B, h, L)), atol=1e-4
    )
    viz = SmokeVisualizer()
    viz.plot_attention_maps(
        attn_w, np.asarray(x0), save_path=str(tmp_path / "attn_e2e.png")
    )
    assert (tmp_path / "attn_e2e.png").exists()


def test_evaluate_cli(trained_exp_dir, tmp_path):
    """evaluate.py report: all five sections present with finite values
    (L3 layer runnable end-to-end, unlike reference src/evaluation which no
    CLI imports)."""
    exp_dir, _ = trained_exp_dir
    from evaluate import run_evaluation

    report = run_evaluation(
        CONFIG, exp_dir, num_samples=4, num_physics_tests=3
    )
    assert set(report) == {
        "physics_consistency", "reconstruction", "gaussian_noise",
        "adversarial", "physics_perturbation",
    }
    assert {"lyapunov_mae", "fractal_mae", "entropy_mae"} <= set(
        report["physics_consistency"]
    )
    assert np.isfinite(report["reconstruction"]["mse"])
    assert 0.0 < report["reconstruction"]["ssim"] <= 1.0
    for level_results in report["gaussian_noise"].values():
        assert np.isfinite(level_results["feature_stability"])
    assert np.isfinite(report["adversarial"]["adversarial_perturbation_norm"])
    assert 0.0 < report["physics_perturbation"][
        "physics_prediction_stability"] <= 1.0


def test_stream_cli(tmp_path, monkeypatch):
    """stream.py end-to-end: fused rollout -> npy/json/png artifacts."""
    import yaml

    import stream

    cfg = {
        "data": {"grid_size": [64, 64]},
        "model": CONFIG["model"],
        "simulation": {"dt": 0.01, "viscosity": 0.001, "grid_size": [64, 64]},
        "tpu": {"use_pallas": False},
    }
    cfg_path = tmp_path / "stream_cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out"
    monkeypatch.setattr(
        sys, "argv",
        ["stream.py", "--config", str(cfg_path), "--frames", "3",
         "--downsample", "2", "--output_dir", str(out_dir)],
    )
    stream.main()

    feats = np.load(out_dir / "physics_features.npy")
    frames = np.load(out_dir / "frames.npy")
    assert feats.shape == (3, 3) and np.isfinite(feats).all()
    assert frames.shape == (3, 32, 32)
    import json

    summary = json.loads((out_dir / "summary.json").read_text())
    assert summary["frames"] == 3
    assert (out_dir / "evolution.png").exists()


def test_stream_cli_mesh_space(tmp_path, monkeypatch):
    """stream.py --mesh_space routes through the domain-decomposed rollout."""
    import yaml

    import stream

    cfg = {
        "data": {"grid_size": [64, 64]},
        "model": CONFIG["model"],
        "simulation": {"dt": 0.01, "viscosity": 0.001, "grid_size": [64, 64]},
        "tpu": {"use_pallas": False},
    }
    cfg_path = tmp_path / "stream_cfg.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    out_dir = tmp_path / "out_sharded"
    monkeypatch.setattr(
        sys, "argv",
        ["stream.py", "--config", str(cfg_path), "--frames", "2",
         "--downsample", "2", "--mesh_space", "4",
         "--output_dir", str(out_dir)],
    )
    stream.main()
    feats = np.load(out_dir / "physics_features.npy")
    assert feats.shape == (2, 3) and np.isfinite(feats).all()


CONFIG3D = {
    "data": {"grid_size": [16, 16, 16], "sequence_length": 12,
             "num_train": 2, "num_val": 2, "cache_dir": None},
    "model": {
        "input_dim": 16,
        "hidden_dim": 32,
        "num_layers": 1,
        "num_heads": 4,
        "output_channels": 8,
        "chaos_strength": 0.1,
    },
    "physics": CONFIG["physics"],
    "training": CONFIG["training"],
    "simulation": {"dt": 0.01, "viscosity": 0.001, "grid_size": [16, 16, 16]},
    "tpu": {"seed": 0, "use_pallas": False},
}


@pytest.fixture(scope="module")
def tiny3d_npz(tmp_path_factory):
    """Random-init volumetric checkpoint in the npz export format — the
    shape the TPU protocol runs consume (checkpoints/*.npz)."""
    import jax.numpy as jnp
    from jax.tree_util import keystr, tree_flatten_with_path

    from smokephysai_tpu.train.serving import build_model

    model = build_model(CONFIG3D)
    g = tuple(CONFIG3D["data"]["grid_size"])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        jnp.zeros((1, *g, 1)), train=False,
    )
    flat = {}
    for col in ("params", "batch_stats"):
        for path, leaf in tree_flatten_with_path(variables[col])[0]:
            flat[f"{col}/{keystr(path)}"] = np.asarray(leaf)
    path = tmp_path_factory.mktemp("ckpt3d") / "tiny3d.npz"
    np.savez_compressed(path, **flat)
    return str(path)


def test_benchmark_protocol_3d(tiny3d_npz):
    """The volumetric benchmark branch (PARITY.md 3D protocol): model MSE,
    physics corr, and the slicewise-Farneback/persistence baselines all
    come out finite. Regression test for the NaN-fill poisoning that an
    out-of-range frame+1 once caused (now rejected at construction)."""
    import benchmark as bench_cli
    from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D

    model, variables = load_model(CONFIG3D, tiny3d_npz)
    predict = make_predictor(model, variables)
    ds = SyntheticSmokeDataset3D(
        num_samples=2, grid_size=(16, 16, 16), sequence_length=12, seed=7
    )
    batches = list(ds.epoch_batches(jax.random.PRNGKey(0), 1, shuffle=False))
    mres = bench_cli.evaluate_model(predict, batches)
    assert np.isfinite(mres["mse"])

    cvres = bench_cli.evaluate_traditional_cv3d(batches)
    assert "Farneback-slice" in cvres and "Persistence" in cvres
    assert np.isfinite(cvres["Persistence"]["mse"])
    bench_cli.print_results(mres, cvres)


def test_evaluate_cli_3d(tiny3d_npz):
    """evaluate.py's volumetric branch: full report, finite values."""
    from evaluate import run_evaluation

    report = run_evaluation(
        CONFIG3D, tiny3d_npz, num_samples=2, num_physics_tests=2
    )
    assert set(report) == {
        "physics_consistency", "reconstruction", "gaussian_noise",
        "adversarial", "physics_perturbation",
    }
    assert np.isfinite(report["reconstruction"]["mse"])
    for level_results in report["gaussian_noise"].values():
        assert np.isfinite(level_results["feature_stability"])


def test_sharded_checkpoint_roundtrip(tmp_path):
    """VERDICT r4 missing #3: save a TrainState whose params are TP/DP-
    sharded on the virtual mesh via train/checkpoint.py, restore into a
    FRESH mesh with the correct shardings, resume one step, assert loss
    continuity (reference train.py:268-277 checkpoint semantics extended to
    the SURVEY §2.6 multi-chip story)."""
    import jax
    import jax.numpy as jnp

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    from jax.sharding import NamedSharding

    from smokephysai_tpu.parallel.mesh import make_mesh
    from smokephysai_tpu.parallel.sharding import (
        param_sharding_specs,
        shard_batch,
        shard_params,
        shard_train_state,
    )
    from smokephysai_tpu.train.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )
    from smokephysai_tpu.train.loop import create_train_state, make_train_step

    cfg = {
        **CONFIG,
        "tpu": {"seed": 0, "use_pallas": False, "data_axis": 2,
                "model_axis": 2},
    }
    mesh = make_mesh(data=2, model=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0))
    state = state.replace(params=shard_params(state.params, mesh))
    tstep = make_train_step(cfg["physics"])
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 3)
    batch = shard_batch(
        {
            "input": jax.random.uniform(ks[0], (4, 64, 64, 1)),
            "target": jax.random.uniform(ks[1], (4, 64, 64, 1)),
            "chaos_features": jax.random.uniform(ks[2], (4, 3)),
        },
        mesh,
    )
    state, _ = tstep(state, batch, key)
    state, _ = tstep(state, batch, key)
    save_checkpoint(str(tmp_path), state, {"epoch": 0})
    # host snapshot first: tstep donates the state's buffers
    saved_np = jax.tree_util.tree_map(np.asarray, state.params)
    _, m_ref = tstep(state, batch, key)  # the step a resume must reproduce
    loss_ref = float(m_ref["total_loss"])

    # fresh mesh + differently-seeded template, sharded BEFORE restore so
    # orbax lays the restored arrays out with the template's shardings
    mesh2 = make_mesh(data=2, model=2)
    template = shard_train_state(
        create_train_state(cfg, jax.random.PRNGKey(42)), mesh2
    )
    restored, _ = restore_checkpoint(str(tmp_path), template)

    # TP shardings survived the roundtrip: every param leaf carries the
    # NamedSharding its spec prescribes, incl. 'model'-sharded kernels
    specs = param_sharding_specs(restored.params)
    saw_model_sharded = False
    for leaf, spec in zip(
        jax.tree_util.tree_leaves(restored.params),
        jax.tree_util.tree_leaves(specs, is_leaf=lambda x: x is None or hasattr(x, "index")),
    ):
        assert isinstance(leaf.sharding, NamedSharding), leaf.sharding
        assert leaf.sharding.spec == spec, (leaf.sharding.spec, spec)
        if "model" in jax.tree_util.tree_leaves(tuple(spec)):
            saw_model_sharded = True
    assert saw_model_sharded

    # restored values match the saved state exactly
    for a, b in zip(
        jax.tree_util.tree_leaves(saved_np),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(a, np.asarray(b))

    # resume: one step from the restored state reproduces the same loss
    _, m2 = tstep(restored, batch, key)
    assert abs(float(m2["total_loss"]) - loss_ref) < 1e-5, (
        float(m2["total_loss"]), loss_ref,
    )


def test_auto_layout_predictor_matches_default(trained_exp_dir):
    """make_predictor(auto_layout=True): AOT compile with compiler-chosen
    weight layouts + one-time device_put of the variables; outputs must
    equal the default arguments-style predictor bitwise-close."""
    import jax.numpy as jnp

    exp_dir, _ = trained_exp_dir
    model, variables = load_model(CONFIG, exp_dir)
    pred = make_predictor(model, variables)
    pred_auto = make_predictor(model, variables, auto_layout=True)
    x = jnp.linspace(0, 1, 2 * 64 * 64).reshape(2, 64, 64, 1)
    a, b = pred(x), pred_auto(x)
    for k in ("reconstructed", "physics_features"):
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=1e-5
        )
    # second call reuses the AOT entry (shape-keyed)
    b2 = pred_auto(x)
    np.testing.assert_array_equal(
        np.asarray(b["reconstructed"]), np.asarray(b2["reconstructed"])
    )
