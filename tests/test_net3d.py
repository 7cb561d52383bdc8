"""3D volumetric model tests (BASELINE 128^3 config)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.models.net3d import SmokePhysNet3D


@pytest.fixture(scope="module")
def model_and_vars():
    model = SmokePhysNet3D(
        hidden_dim=64, num_layers=1, num_heads=4, output_channels=8
    )
    x = jnp.zeros((1, 32, 32, 32, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    return model, variables


def test_forward_contract(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 32, 32, 32, 1))
    out = model.apply(variables, x, train=False, rngs={"chaos": jax.random.PRNGKey(3)})
    assert out["reconstructed"].shape == (2, 32, 32, 32, 1)
    assert out["physics_features"].shape == (2, 3)
    assert 0.0 <= float(out["reconstructed"].min())
    assert float(out["reconstructed"].max()) <= 1.0


def test_gradients_flow(model_and_vars):
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(4), (1, 32, 32, 32, 1))

    def loss(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True,
            rngs={"chaos": jax.random.PRNGKey(5),
                  "dropout": jax.random.PRNGKey(6)},
            mutable=["batch_stats"],
        )
        return jnp.mean(out["reconstructed"] ** 2) + jnp.mean(
            out["physics_features"] ** 2
        )

    grads = jax.grad(loss)(variables["params"])
    total = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert total > 0


def test_sim3d_to_model_pipeline():
    """End-to-end: 3D solver volume -> volumetric model forward."""
    from smokephysai_tpu.physics.solver3d import (
        add_smoke_source3d, init_state3d, step3d,
    )

    s = init_state3d((32, 32, 32))
    s = s.replace(density=add_smoke_source3d(s.density, 16.0, 16.0, 16.0, 6.0))
    s = step3d(s)
    model = SmokePhysNet3D(hidden_dim=64, num_layers=1, num_heads=4,
                           output_channels=8)
    x = s.density[None, :, :, :, None]
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    out = model.apply(variables, x, train=False,
                      rngs={"chaos": jax.random.PRNGKey(2)})
    assert np.isfinite(np.asarray(out["physics_features"])).all()


def test_3d_dataset_and_train_step():
    """3D data pipeline -> SmokePhysNet3D train step: loss decreases."""
    import optax
    from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D
    from smokephysai_tpu.models.regularizer import physics_losses

    ds = SyntheticSmokeDataset3D(
        num_samples=4, grid_size=(32, 32, 32), sequence_length=12, seed=0
    )
    assert len(ds) == 4
    batch = ds.sample_batch(jax.random.PRNGKey(0), 2)
    assert batch["input"].shape == (2, 32, 32, 32, 1)
    assert batch["chaos_features"].shape == (2, 3)

    model = SmokePhysNet3D(hidden_dim=64, num_layers=1, num_heads=4,
                           output_channels=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "chaos": jax.random.PRNGKey(2)},
        batch["input"], train=False,
    )
    tx = optax.adamw(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, bs, opt_state, batch, key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": bs}, batch["input"], train=True,
                rngs={"chaos": key, "dropout": key}, mutable=["batch_stats"],
            )
            recon = jnp.mean((out["reconstructed"] - batch["target"]) ** 2)
            chaos = jnp.mean(
                (out["physics_features"] - batch["chaos_features"]) ** 2
            )
            phys = physics_losses(
                {"density": out["reconstructed"]},
                {"density": batch["target"]},
            )["total_physics_loss"]
            return recon + 0.1 * chaos + 0.05 * phys, mut["batch_stats"]

        (loss, new_bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bs, opt_state, loss

    params, bs = variables["params"], variables["batch_stats"]
    losses = []
    for i in range(4):
        params, bs, opt_state, loss = step(
            params, bs, opt_state, batch, jax.random.PRNGKey(3 + i)
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_fit_3d_end_to_end(tmp_path):
    """VERDICT r1 item 5: `train.py --config config_128cubed.yaml`-style
    training must work through the SAME fit() driver as 2D — a 3-element
    grid_size selects SmokePhysNet3D + the volumetric dataset. Tiny 16^3
    proxy of config/config_128cubed.yaml."""
    from smokephysai_tpu.data.synthetic3d import create_data_loaders3d
    from smokephysai_tpu.train.loop import fit
    from smokephysai_tpu.utils.config import load_config

    cfg = load_config("config/config_128cubed.yaml")
    cfg["data"].update(grid_size=[16, 16, 16], num_train=4, num_val=2,
                       sequence_length=12)
    cfg["model"].update(hidden_dim=64, num_layers=1, num_heads=4,
                        output_channels=8)
    cfg["training"].update(batch_size=2, num_epochs=2)

    train_ds, val_ds = create_data_loaders3d(
        batch_size=2, num_train=4, num_val=2, grid_size=(16, 16, 16),
        sequence_length=12, seed=0,
    )
    logs = []
    state = fit(cfg, train_ds, val_ds, str(tmp_path), print_fn=logs.append)
    assert int(state.step) == 2 * 2  # 2 epochs x (4 episodes / batch 2)
    assert any("Epoch 2/2" in l for l in logs)
    # best-val checkpoint written by the shared driver
    import os
    assert any(os.scandir(str(tmp_path)))


def test_flash_path_equals_einsum_3d(model_and_vars):
    """use_flash on the 512-token 3D trunk must match the einsum path."""
    model, variables = model_and_vars
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, 16, 16, 16, 1))
    rngs = {"chaos": jax.random.PRNGKey(8)}
    out_ref = model.apply(variables, x, train=False, rngs=rngs)
    flash_model = model.clone(use_flash=True)
    out_flash = flash_model.apply(variables, x, train=False, rngs=rngs)
    np.testing.assert_allclose(
        np.asarray(out_flash["reconstructed"]),
        np.asarray(out_ref["reconstructed"]),
        atol=2e-5,
    )


def test_3d_quality_protocol(tmp_path):
    """VERDICT r2 item 5: the volumetric quality protocol end-to-end —
    serving.build_model dispatches to SmokePhysNet3D for 3-element
    grid_size, benchmark.evaluate_model + the 3D CV baselines run on volume
    batches, and evaluate.run_evaluation produces all five report sections
    (slicewise SSIM, chunked 3D physics-perturbation scenarios). Tiny 16^3
    proxy of the 128^3 protocol published in PARITY.md."""
    import numpy as np_
    from jax.tree_util import keystr, tree_flatten_with_path

    from smokephysai_tpu.train.serving import build_model, make_predictor
    from smokephysai_tpu.utils.config import load_config

    cfg = load_config("config/config_128cubed.yaml")
    cfg["data"].update(grid_size=[16, 16, 16], sequence_length=12)
    cfg["model"].update(hidden_dim=64, num_layers=1, num_heads=4,
                        output_channels=8)

    model = build_model(cfg)
    from smokephysai_tpu.models.net3d import SmokePhysNet3D

    assert isinstance(model, SmokePhysNet3D)
    x = jnp.zeros((1, 16, 16, 16, 1))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "chaos": jax.random.PRNGKey(1)},
        x, train=False,
    )
    # flat npz export round-trip (scripts/export_checkpoint.py format)
    flat = {}
    for col in ("params", "batch_stats"):
        for path, leaf in tree_flatten_with_path(variables[col])[0]:
            flat[f"{col}/{keystr(path)}"] = np_.asarray(leaf)
    ckpt = str(tmp_path / "net3d.npz")
    np_.savez_compressed(ckpt, **flat)

    # benchmark protocol pieces on volume batches
    from benchmark import evaluate_model, evaluate_traditional_cv3d
    from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D
    from smokephysai_tpu.train.serving import load_model

    model2, vars2 = load_model(cfg, ckpt)
    predict = make_predictor(model2, vars2)
    ds = SyntheticSmokeDataset3D(
        num_samples=2, grid_size=(16, 16, 16), sequence_length=12, seed=5
    )
    batches = lambda: ds.epoch_batches(
        jax.random.PRNGKey(0), batch_size=1, shuffle=False
    )
    res = evaluate_model(predict, batches())
    assert np.isfinite(res["mse"]) and res["mse"] >= 0
    assert np.isfinite(res["inference_time"])
    cv = evaluate_traditional_cv3d(batches())
    assert set(cv) == {"Farneback-slice", "Persistence"}
    assert all(np.isfinite(r["mse"]) for r in cv.values())

    # full evaluation report (3D branch)
    from evaluate import run_evaluation

    report = run_evaluation(cfg, ckpt, num_samples=2, num_physics_tests=2)
    assert set(report) == {
        "physics_consistency", "reconstruction", "gaussian_noise",
        "adversarial", "physics_perturbation",
    }
    assert np.isfinite(report["reconstruction"]["ssim"])
    assert 0.0 < report["physics_perturbation"][
        "physics_prediction_stability"] <= 1.0


def test_3d_dataset_f16_device_storage(monkeypatch):
    """Past DEVICE_BYTES_LIMIT the 3D dataset stores sequences as f16 and
    batch gathers cast back to f32 (the 2x data-scaling lever for the 3D
    quality recipe, mirroring the 2D dataset's policy)."""
    from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D

    ds32 = SyntheticSmokeDataset3D(
        num_samples=2, grid_size=(16, 16, 16), sequence_length=12, seed=3
    )
    monkeypatch.setattr(SyntheticSmokeDataset3D, "DEVICE_BYTES_LIMIT", 1)
    ds16 = SyntheticSmokeDataset3D(
        num_samples=2, grid_size=(16, 16, 16), sequence_length=12, seed=3
    )
    assert not ds32._seq_f16 and ds16._seq_f16
    assert ds16._sequences.dtype == jnp.float16

    b32 = ds32.sample_batch(jax.random.PRNGKey(0), 2)
    b16 = ds16.sample_batch(jax.random.PRNGKey(0), 2)
    for k in ("input", "target", "sequence"):
        assert b16[k].dtype == jnp.float32
        np.testing.assert_allclose(
            np.asarray(b16[k]), np.asarray(b32[k]), atol=1e-3
        )
    np.testing.assert_array_equal(
        np.asarray(b16["chaos_features"]), np.asarray(b32["chaos_features"])
    )
