"""Data pipeline + training loop tests (reference semantics:
data_loader.py sampling, train.py loss/optimiser; SURVEY.md §4)."""
import copy
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.data import SyntheticSmokeDataset, sample_source_params
from smokephysai_tpu.train.checkpoint import restore_checkpoint, save_checkpoint
from smokephysai_tpu.train.loop import (
    cosine_epoch_schedule,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from smokephysai_tpu.train import metrics as M

TINY_CONFIG = {
    "data": {"grid_size": [64, 64], "sequence_length": 20},
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
        "num_epochs": 4,
        "learning_rate": 1e-3,
        "weight_decay": 0.01,
    },
    "tpu": {"seed": 0},
}


@pytest.fixture(scope="module")
def tiny_ds():
    return SyntheticSmokeDataset(
        num_samples=6, grid_size=(64, 64), sequence_length=20, seed=0
    )


class TestSourceSampling:
    def test_distributions(self):
        p = sample_source_params(jax.random.PRNGKey(0), 500, (128, 128))
        xy = np.asarray(p["xy"])
        active = np.asarray(p["active"])
        inten = np.asarray(p["intensity"])
        assert xy.min() >= 20 and xy.max() < 108  # margins (data_loader.py:54-55)
        assert inten.min() >= 0.5 and inten.max() <= 2.0
        counts = active.sum(axis=1)
        assert set(np.unique(counts)) == {1.0, 2.0, 3.0}
        # mask is a prefix: active slots come first
        assert np.all(np.diff(active, axis=1) <= 0)


class TestDataset:
    def test_shapes_and_batching(self, tiny_ds):
        assert len(tiny_ds) == 6
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(1), 4)
        assert batch["input"].shape == (4, 64, 64, 1)
        assert batch["target"].shape == (4, 64, 64, 1)
        assert batch["chaos_features"].shape == (4, 3)
        assert batch["sequence"].shape == (4, 20, 64, 64)

    def test_short_sequence_rejected(self):
        """T <= 10 leaves randint(5, T-5) empty; the reference raises there
        and jax's NaN-fill out-of-bounds gather must not be reached
        silently (it poisoned benchmark targets at T=6)."""
        import pytest

        from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D

        with pytest.raises(ValueError, match="sequence_length"):
            SyntheticSmokeDataset(
                num_samples=1, grid_size=(16, 16), sequence_length=10
            )
        with pytest.raises(ValueError, match="sequence_length"):
            SyntheticSmokeDataset3D(
                num_samples=1, grid_size=(8, 8, 8), sequence_length=6
            )

    def test_target_is_next_frame(self, tiny_ds):
        idx = jnp.array([0, 1])
        frames = jnp.array([5, 7])
        b = tiny_ds.get_batch(idx, frames)
        np.testing.assert_array_equal(
            np.asarray(b["input"][0, :, :, 0]),
            np.asarray(tiny_ds._sequences[0, 5]),
        )
        np.testing.assert_array_equal(
            np.asarray(b["target"][1, :, :, 0]),
            np.asarray(tiny_ds._sequences[1, 8]),
        )

    def test_epoch_batches_counts(self, tiny_ds):
        train_batches = list(
            tiny_ds.epoch_batches(jax.random.PRNGKey(2), 4, shuffle=True)
        )
        assert len(train_batches) == 1  # 6//4, partial dropped when shuffled
        val_batches = list(
            tiny_ds.epoch_batches(jax.random.PRNGKey(2), 4, shuffle=False)
        )
        assert len(val_batches) == 2  # partial kept for validation
        assert val_batches[1]["input"].shape[0] == 2

    def test_host_resident_path_matches_device_path(self, monkeypatch):
        """Datasets beyond DEVICE_BYTES_LIMIT keep sequences on host and
        replace the per-batch 'sequence' with precomputed per-episode
        'continuity'; input/target/losses must be identical (512^2 path)."""
        from smokephysai_tpu.train.loop import compute_losses

        dev = SyntheticSmokeDataset(
            num_samples=4, grid_size=(32, 32), sequence_length=12, seed=5
        )
        monkeypatch.setattr(SyntheticSmokeDataset, "DEVICE_BYTES_LIMIT", 1)
        host = SyntheticSmokeDataset(
            num_samples=4, grid_size=(32, 32), sequence_length=12, seed=5
        )
        assert dev._on_device and not host._on_device

        idx, frames = jnp.array([0, 2, 3]), jnp.array([5, 6, 7])
        b_dev, b_host = dev.get_batch(idx, frames), host.get_batch(idx, frames)
        np.testing.assert_array_equal(
            np.asarray(b_dev["input"]), np.asarray(b_host["input"])
        )
        np.testing.assert_array_equal(
            np.asarray(b_dev["target"]), np.asarray(b_host["target"])
        )
        assert "sequence" not in b_host

        outputs = {
            "reconstructed": b_dev["target"] * 0.9,
            "physics_features": b_dev["chaos_features"] * 1.1,
        }
        cfg = TINY_CONFIG["physics"]
        _, m_dev = compute_losses(outputs, b_dev, cfg)
        _, m_host = compute_losses(outputs, b_host, cfg)
        np.testing.assert_allclose(
            float(m_dev["total_loss"]), float(m_host["total_loss"]), rtol=1e-6
        )

    def test_f16_device_path_matches_f32(self, monkeypatch):
        """Datasets just over DEVICE_BYTES_LIMIT at f32 stay on device as
        float16 storage: batches carry f32 frames (quantised ~6e-4) and the
        precomputed f32 'continuity' instead of the f16 'sequence'."""
        from smokephysai_tpu.train.loop import compute_losses

        dev = SyntheticSmokeDataset(
            num_samples=4, grid_size=(32, 32), sequence_length=12, seed=5
        )
        nbytes = dev.data["sequences"].nbytes
        monkeypatch.setattr(
            SyntheticSmokeDataset, "DEVICE_BYTES_LIMIT", nbytes / 2 + 1
        )
        half = SyntheticSmokeDataset(
            num_samples=4, grid_size=(32, 32), sequence_length=12, seed=5
        )
        assert half._on_device and half._seq_f16 and not dev._seq_f16

        idx, frames = jnp.array([0, 2, 3]), jnp.array([5, 6, 7])
        b_dev, b_half = dev.get_batch(idx, frames), half.get_batch(idx, frames)
        assert b_half["input"].dtype == jnp.float32
        assert "sequence" not in b_half and "continuity" in b_half
        np.testing.assert_allclose(
            np.asarray(b_dev["input"]), np.asarray(b_half["input"]), atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(b_dev["target"]), np.asarray(b_half["target"]), atol=2e-3
        )
        # continuity constants are the f32 originals — loss parity to f32
        outputs = {
            "reconstructed": b_dev["target"] * 0.9,
            "physics_features": b_dev["chaos_features"] * 1.1,
        }
        cfg = TINY_CONFIG["physics"]
        _, m_dev = compute_losses(outputs, b_dev, cfg)
        _, m_half = compute_losses(outputs, b_half, cfg)
        # frame quantisation feeds the recon MSE term: ~3e-4 relative
        np.testing.assert_allclose(
            float(m_dev["total_loss"]), float(m_half["total_loss"]), rtol=1e-3
        )

    def test_vorticity_eps_changes_generated_data(self, tmp_path):
        """BASELINE configs[1] wiring (VERDICT r1 item 4): vorticity_eps must
        flow from the config through create_data_loaders into the generating
        simulator and measurably change the data — AND the caches of the two
        settings must not collide in a shared cache_dir."""
        from smokephysai_tpu.data import create_data_loaders
        from smokephysai_tpu.utils.config import load_config

        cfg = load_config("config/config_256_vorticity.yaml")
        assert cfg["tpu"]["vorticity_eps"] == 2.0

        common = dict(
            batch_size=2, num_train=2, num_val=1, grid_size=(64, 64),
            sequence_length=12, seed=0, cache_dir=str(tmp_path),
        )
        plain, _ = create_data_loaders(vorticity_eps=0.0, **common)
        vort, _ = create_data_loaders(vorticity_eps=2.0, **common)
        assert not np.allclose(
            np.asarray(plain._sequences), np.asarray(vort._sequences)
        )
        # distinct cache files — a second loader with eps=2 must hit its own
        vort2, _ = create_data_loaders(vorticity_eps=2.0, **common)
        np.testing.assert_array_equal(
            np.asarray(vort._sequences), np.asarray(vort2._sequences)
        )

    def test_cache_roundtrip(self, tmp_path):
        cache = str(tmp_path / "cache.npz")
        ds1 = SyntheticSmokeDataset(
            num_samples=2, grid_size=(32, 32), cache_path=cache, seed=3
        )
        assert os.path.exists(cache)
        ds2 = SyntheticSmokeDataset(
            num_samples=2, grid_size=(32, 32), cache_path=cache, seed=999
        )
        np.testing.assert_array_equal(
            np.asarray(ds1._sequences), np.asarray(ds2._sequences)
        )


class TestTraining:
    def test_cosine_schedule_matches_torch_semantics(self):
        sched = cosine_epoch_schedule(1e-3, 10, steps_per_epoch=5)
        assert float(sched(0)) == pytest.approx(1e-3)  # epoch 0: base lr
        assert float(sched(4)) == pytest.approx(1e-3)  # still epoch 0
        assert float(sched(5)) == pytest.approx(
            1e-3 * 0.5 * (1 + np.cos(np.pi / 10))
        )
        assert float(sched(50)) == pytest.approx(0.0, abs=1e-9)

    def test_cosine_schedule_two_phase_continuity(self):
        """schedule_epochs/epoch_offset let a second run (e.g. an f32 polish
        started from a bf16 phase-1 export) continue the SAME 100-epoch
        anneal: phase-2 step 0 must equal the one-run schedule at epoch 70,
        and the tail must still reach ~0."""
        one_run = cosine_epoch_schedule(1e-3, 100, steps_per_epoch=5)
        phase2 = cosine_epoch_schedule(
            1e-3, 30, steps_per_epoch=5, schedule_epochs=100, epoch_offset=70
        )
        for e in range(0, 30, 7):
            assert float(phase2(e * 5)) == pytest.approx(
                float(one_run((70 + e) * 5)), rel=1e-6
            )
        assert float(phase2(30 * 5)) == pytest.approx(0.0, abs=1e-9)

    def test_train_steps_reduce_loss(self, tiny_ds):
        state = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        tstep = make_train_step(TINY_CONFIG["physics"])
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(5), 2)
        losses = []
        for i in range(8):
            state, m = tstep(state, batch, jax.random.PRNGKey(6))
            losses.append(float(m["total_loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 8

    def test_train_step_rbg_rng(self, tiny_ds):
        """tpu.train_rng='rbg' (the fast dropout-RNG path, utils/config.py):
        the caller's key stays threefry — the step re-wraps its derived
        streams as rbg keys in-trace (_make_step_impl) — and the step
        trains; param init is threefry either way so initial weights are
        identical to the parity config."""
        state = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        tstep = make_train_step(TINY_CONFIG["physics"], rng_impl="rbg")
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(5), 2)
        key = jax.random.PRNGKey(6)
        losses = []
        for _ in range(8):
            state, m = tstep(state, batch, key)
            losses.append(float(m["total_loss"]))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0]

    def test_fit_rbg_rng_smoke(self, tiny_ds, tmp_path):
        """fit() under tpu.train_rng='rbg' runs end-to-end (epoch driver,
        eval pass, checkpointing) with the typed-key stream."""
        import copy

        from smokephysai_tpu.train.loop import fit

        cfg = copy.deepcopy(TINY_CONFIG)
        cfg["tpu"]["train_rng"] = "rbg"
        cfg["training"]["num_epochs"] = 1
        state = fit(cfg, tiny_ds, tiny_ds, str(tmp_path), print_fn=lambda *a: None)
        assert np.all(
            np.isfinite(np.asarray(jax.tree_util.tree_leaves(state.params)[0]))
        )

    def test_ema_train_step(self, tiny_ds):
        """ema_decay>0 returns the 4-arg step; the EMA tracks params with
        the expected one-step update rule and stays between init and the
        live params."""
        state = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        decay = 0.9
        tstep = make_train_step(TINY_CONFIG["physics"], ema_decay=decay)
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(5), 2)
        p0 = jax.tree_util.tree_map(np.asarray, state.params)
        ema = jax.tree_util.tree_map(jnp.copy, state.params)
        state, ema, m = tstep(state, ema, batch, jax.random.PRNGKey(6))
        # one step: ema == p0 + (1-decay)*(p1 - p0)
        expect = jax.tree_util.tree_map(
            lambda a, b: a + (1.0 - decay) * (np.asarray(b) - a),
            p0,
            state.params,
        )
        jax.tree_util.tree_map(
            lambda e, x: np.testing.assert_allclose(
                np.asarray(e), x, rtol=1e-6, atol=1e-7
            ),
            ema,
            expect,
        )
        # several more steps: EMA stays finite and distinct from live params
        for _ in range(3):
            state, ema, m = tstep(state, ema, batch, jax.random.PRNGKey(6))
        leaf_e = np.asarray(jax.tree_util.tree_leaves(ema)[0])
        leaf_p = np.asarray(jax.tree_util.tree_leaves(state.params)[0])
        assert np.all(np.isfinite(leaf_e))
        assert not np.allclose(leaf_e, leaf_p)

    def test_ema_fit_smoke(self, tiny_ds, tmp_path):
        """fit() with training.ema_decay trains, validates and checkpoints
        the EMA weights end-to-end."""
        from smokephysai_tpu.train.loop import fit

        config = {
            **TINY_CONFIG,
            "training": {**TINY_CONFIG["training"], "num_epochs": 2,
                         "ema_decay": 0.9},
        }
        state = fit(config, tiny_ds, tiny_ds, str(tmp_path), writer=None)
        restored, meta = restore_checkpoint(
            str(tmp_path),
            create_train_state(config, jax.random.PRNGKey(1), 3),
        )
        assert meta.get("ema_decay") == 0.9
        # the checkpointed params are the EMA weights returned by fit()
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b)
            ),
            restored.params,
            state.params,
        )

    def test_fused_epoch_matches_loop(self, tiny_ds):
        """tpu.fused_epoch correctness: one whole-epoch lax.scan program
        (make_train_epoch / make_eval_epoch) must reproduce the per-batch
        loop exactly — same batch composition (shared epoch_order_frames
        draws), same per-step PRNG (rng=k_epoch, fold_in(state.step)),
        matching losses and final params."""
        from smokephysai_tpu.train.loop import make_eval_epoch, make_train_epoch

        B = 2
        state_a = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        state_b = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        k = jax.random.PRNGKey(42)

        tstep = make_train_step(TINY_CONFIG["physics"])
        loop_losses = []
        for batch in tiny_ds.epoch_batches(k, B, shuffle=True):
            state_a, m = tstep(state_a, batch, k)
            loop_losses.append(float(m["total_loss"]))

        tepoch = make_train_epoch(tiny_ds, TINY_CONFIG["physics"], B)
        state_b, stacked = tepoch(state_b, k)
        fused_losses = np.asarray(stacked["total_loss"])

        assert len(loop_losses) == len(fused_losses) == len(tiny_ds) // B
        np.testing.assert_allclose(fused_losses, loop_losses, rtol=2e-5)
        assert int(state_b.step) == int(state_a.step)
        # not bit-exact: XLA schedules the scan body differently from the
        # per-batch jit, and Adam amplifies reordering noise early on (v≈0
        # makes m/(sqrt(v)+eps) swing by up to one lr quantum per step), so
        # params agree to ~lr while the per-step losses above agree to 2e-5
        # — the loss trajectory is what proves identical batch composition
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-3
            ),
            state_a.params,
            state_b.params,
        )

        ke = jax.random.PRNGKey(7)
        estep = make_eval_step(TINY_CONFIG["physics"])
        ev_loop = [
            float(estep(state_b, batch, ke)["total_loss"])
            for batch in tiny_ds.epoch_batches(ke, B, shuffle=False)
        ]
        eepoch = make_eval_epoch(tiny_ds, TINY_CONFIG["physics"], B)
        ev_fused = np.asarray(eepoch(state_b, ke)["total_loss"])
        np.testing.assert_allclose(ev_fused, ev_loop, rtol=2e-5)

    def test_fused_epoch_fit(self, tiny_ds, tmp_path):
        """fit() with tpu.fused_epoch end-to-end, including the ragged val
        tail (5 val episodes at batch 2 -> 2 fused batches + 1 eager):
        same epoch losses as the per-batch fit."""
        from smokephysai_tpu.train.loop import fit

        val_ds = SyntheticSmokeDataset(
            num_samples=5, grid_size=(64, 64), sequence_length=20, seed=1
        )
        config = {
            **TINY_CONFIG,
            "training": {**TINY_CONFIG["training"], "num_epochs": 2},
        }
        logs = {}
        for name, fused in (("loop", False), ("fused", True)):
            cfg = {**config, "tpu": {**config["tpu"], "fused_epoch": fused}}
            lines = []
            fit(
                cfg, tiny_ds, val_ds, str(tmp_path / name), writer=None,
                print_fn=lambda *a: lines.append(" ".join(map(str, a))),
            )
            logs[name] = [l for l in lines if l.startswith("Epoch")]
        def losses(lines):  # "Epoch e/N: train X val Y lr ..." -> [(X, Y)]
            return np.array(
                [[float(l.split()[3]), float(l.split()[5])] for l in lines]
            )

        assert len(logs["fused"]) == 2
        # rtol reflects the param drift of test_fused_epoch_matches_loop
        # (Adam amplifies scan-vs-loop scheduling noise) carried into epoch
        # aggregates — composition identity is proven per-step there
        np.testing.assert_allclose(
            losses(logs["fused"]), losses(logs["loop"]), rtol=1e-3
        )

    def test_fused_epoch_ema(self, tiny_ds, tmp_path):
        """tpu.fused_epoch composes with training.ema_decay: the EMA carry
        rides inside the scan; epoch losses and the returned (EMA) params
        match the per-batch EMA path."""
        from smokephysai_tpu.train.loop import fit

        config = {
            **TINY_CONFIG,
            "training": {**TINY_CONFIG["training"], "num_epochs": 2,
                         "ema_decay": 0.9},
        }
        states, logs = {}, {}
        for name, fused in (("loop", False), ("fused", True)):
            cfg = {**config, "tpu": {**config["tpu"], "fused_epoch": fused}}
            lines = []
            states[name] = fit(
                cfg, tiny_ds, tiny_ds, str(tmp_path / name), writer=None,
                print_fn=lambda *a: lines.append(" ".join(map(str, a))),
            )
            logs[name] = [l for l in lines if l.startswith("Epoch")]

        def losses(lines):
            return np.array(
                [[float(l.split()[3]), float(l.split()[5])] for l in lines]
            )

        np.testing.assert_allclose(
            losses(logs["fused"]), losses(logs["loop"]), rtol=1e-3
        )
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-3
            ),
            states["loop"].params,
            states["fused"].params,
        )

    def test_eval_step_runs(self, tiny_ds):
        state = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        estep = make_eval_step(TINY_CONFIG["physics"])
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(5), 2)
        m = estep(state, batch, jax.random.PRNGKey(7))
        assert np.isfinite(float(m["total_loss"]))

    def test_checkpoint_roundtrip(self, tiny_ds, tmp_path):
        state = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        tstep = make_train_step(TINY_CONFIG["physics"])
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(5), 2)
        state, _ = tstep(state, batch, jax.random.PRNGKey(6))

        save_checkpoint(str(tmp_path), state, {"epoch": 0, "val_loss": 1.0})
        fresh = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(99), steps_per_epoch=3
        )
        restored, meta = restore_checkpoint(str(tmp_path), fresh)
        assert meta["epoch"] == 0
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            state.params,
            restored.params,
        )
        assert int(restored.step) == 1

    def test_last_model_meta_pairing(self, tiny_ds, tmp_path):
        """restore_checkpoint on a last_model path must read
        last_model_meta.json (save_checkpoint's pairing), NOT the best-val
        meta.json — otherwise a phase-2 --resume from last_model restarts
        at the best epoch and re-runs completed epochs."""
        from smokephysai_tpu.train.checkpoint import LAST_NAME

        state = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        save_checkpoint(str(tmp_path), state, {"epoch": 3, "val_loss": 1.0})
        save_checkpoint(
            str(tmp_path), state, {"epoch": 9, "val_loss": 2.0},
            name=LAST_NAME,
        )
        _, meta_best = restore_checkpoint(str(tmp_path), state)
        _, meta_last = restore_checkpoint(
            str(tmp_path / LAST_NAME), state
        )
        assert meta_best["epoch"] == 3
        assert meta_last["epoch"] == 9

    def test_fused_epoch_gate_3d_dataset_falls_back(self, tmp_path, capsys):
        """tpu.fused_epoch on a dataset WITHOUT the _on_device marker and
        without stage_epoch (the 3D dataset) must fall back to the
        per-batch loop — neither the fused nor the staged program — not
        crash on device_arrays()/stage_epoch()."""
        from smokephysai_tpu.data.synthetic3d import SyntheticSmokeDataset3D
        from smokephysai_tpu.train.loop import fit

        ds = SyntheticSmokeDataset3D(
            num_samples=2, grid_size=(16, 16, 16), sequence_length=12, seed=0
        )
        config = {
            "data": {"grid_size": [16, 16, 16], "sequence_length": 12},
            "model": {"input_dim": 16, "hidden_dim": 32, "num_layers": 1,
                      "num_heads": 4, "output_channels": 8,
                      "chaos_strength": 0.1},
            "physics": TINY_CONFIG["physics"],
            "training": {**TINY_CONFIG["training"], "num_epochs": 1},
            "tpu": {"seed": 0, "fused_epoch": True},
        }
        fit(config, ds, ds, str(tmp_path), writer=None)
        out = capsys.readouterr().out
        assert "Fused-epoch training" not in out
        assert "Staged-epoch training" not in out


class TestMetrics:
    def test_ssim_identical_is_one(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 1))
        assert float(M.ssim(x, x)) == pytest.approx(1.0, abs=1e-3)

    def test_psnr_and_mse(self):
        x = jnp.zeros((1, 8, 8, 1))
        y = jnp.full((1, 8, 8, 1), 0.1)
        assert float(M.mse(x, y)) == pytest.approx(0.01)
        assert float(M.psnr(x, y)) == pytest.approx(20.0, abs=1e-3)

    def test_pearson_matches_scipy(self):
        from scipy.stats import pearsonr

        rng = np.random.default_rng(0)
        a = rng.normal(size=(5, 3)).astype(np.float32)
        b = rng.normal(size=(5, 3)).astype(np.float32)
        ours = np.asarray(M.pearson_per_sample(jnp.asarray(a), jnp.asarray(b)))
        for i in range(5):
            assert ours[i] == pytest.approx(pearsonr(a[i], b[i])[0], abs=1e-5)


class TestMeshGeneration:
    def test_sharded_generation_matches_unsharded(self):
        """Episode generation sharded over the data axis must produce the
        same episodes (GSPMD placement only)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        from smokephysai_tpu.data.synthetic import generate_dataset
        from smokephysai_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=8)
        key = jax.random.PRNGKey(11)
        a = generate_dataset(key, 8, (32, 32), sequence_length=12)
        b = generate_dataset(key, 8, (32, 32), sequence_length=12, mesh=mesh)
        np.testing.assert_allclose(
            a["sequences"], b["sequences"], atol=1e-6
        )
        np.testing.assert_allclose(a["chaos"], b["chaos"], atol=1e-5)


def test_ssim_psnr_golden_parity():
    """SSIM/PSNR vs values recorded from the reference implementation
    (robustness_metrics.py:76-103)."""
    g = np.load(os.path.join(os.path.dirname(__file__), "goldens",
                             "metrics.npz"))
    a = jnp.asarray(g["a"].transpose(0, 2, 3, 1))
    b = jnp.asarray(g["b"].transpose(0, 2, 3, 1))
    assert float(M.ssim(a, b)) == pytest.approx(float(g["ssim"]), abs=1e-5)
    assert float(M.psnr(a, b)) == pytest.approx(float(g["psnr"]), abs=1e-4)


def test_host_resident_prefetch_batches_identical(monkeypatch):
    """The prefetch thread (host-resident path) must yield byte-identical
    batches in the same order as the synchronous generator."""
    from smokephysai_tpu.data.synthetic import SyntheticSmokeDataset

    monkeypatch.setattr(SyntheticSmokeDataset, "DEVICE_BYTES_LIMIT", 0)
    ds = SyntheticSmokeDataset(
        num_samples=12, grid_size=(32, 32), sequence_length=12, seed=3
    )
    assert not ds._on_device
    key = jax.random.PRNGKey(5)
    pre = list(ds.epoch_batches(key, 4, shuffle=True))
    sync = list(ds._epoch_batches_sync(key, 4, shuffle=True))
    assert len(pre) == len(sync) == 3
    for a, b in zip(pre, sync):
        for k in ("input", "target", "chaos_features", "continuity"):
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestNoiseAugmentation:
    """training.noise_std: opt-in Gaussian INPUT noise (denoising
    augmentation; no reference analog — train.py trains clean)."""

    def test_noise_changes_metrics_but_not_targets(self, tiny_ds):
        state0 = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(5), 2)
        key = jax.random.PRNGKey(6)
        clean = make_train_step(TINY_CONFIG["physics"])
        noisy = make_train_step(TINY_CONFIG["physics"], noise_std=0.5)

        _, m_clean = clean(
            jax.tree_util.tree_map(jnp.copy, state0), batch, key
        )
        _, m_noisy = noisy(
            jax.tree_util.tree_map(jnp.copy, state0), batch, key
        )
        # noise perturbs the forward -> different loss
        assert float(m_clean["total_loss"]) != float(m_noisy["total_loss"])
        # noise_std=0.0 is exactly the old step (default path unchanged)
        default = make_train_step(TINY_CONFIG["physics"], noise_std=0.0)
        _, m_default = default(
            jax.tree_util.tree_map(jnp.copy, state0), batch, key
        )
        np.testing.assert_allclose(
            float(m_default["total_loss"]), float(m_clean["total_loss"]),
            rtol=1e-6,
        )

    def test_noisy_training_reduces_loss(self, tiny_ds):
        state = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        tstep = make_train_step(TINY_CONFIG["physics"], noise_std=0.02)
        batch = tiny_ds.sample_batch(jax.random.PRNGKey(5), 2)
        losses = []
        for i in range(8):
            state, m = tstep(state, batch, jax.random.fold_in(jax.random.PRNGKey(6), i))
            losses.append(float(m["total_loss"]))
        assert losses[-1] < losses[0]


class TestStagedEpoch:
    """Host-path staged whole-epoch program (make_train_epoch_staged):
    one H2D put + one dispatch per epoch instead of 4 RPCs per batch."""

    def _host_ds(self, monkeypatch, n=6):
        monkeypatch.setattr(SyntheticSmokeDataset, "DEVICE_BYTES_LIMIT", 1)
        ds = SyntheticSmokeDataset(
            num_samples=n, grid_size=(64, 64), sequence_length=20, seed=0
        )
        assert not ds._on_device and not ds._seq_f16
        return ds

    def test_stage_epoch_matches_loop_batches(self, monkeypatch):
        ds = self._host_ds(monkeypatch)
        key = jax.random.PRNGKey(3)
        staged = ds.stage_epoch(key, 2)
        loop_batches = list(ds._epoch_batches_sync(key, 2, shuffle=True))
        assert staged["input"].shape[0] == len(loop_batches)
        for i, b in enumerate(loop_batches):
            np.testing.assert_array_equal(
                staged["input"][i], np.asarray(b["input"])
            )
            np.testing.assert_array_equal(
                staged["target"][i], np.asarray(b["target"])
            )
            np.testing.assert_array_equal(
                staged["chaos_features"][i], np.asarray(b["chaos_features"])
            )
            np.testing.assert_array_equal(
                staged["continuity"][i], np.asarray(b["continuity"])
            )

    def test_staged_fit_matches_loop_fit(self, monkeypatch, tmp_path, capsys):
        """fit() with tpu.fused_epoch on a host-resident dataset runs the
        staged path and lands the same params as the per-batch loop."""
        from smokephysai_tpu.train.loop import fit

        config = {
            **TINY_CONFIG,
            "training": {**TINY_CONFIG["training"], "num_epochs": 2},
            "tpu": {"seed": 0, "fused_epoch": True},
        }
        ds = self._host_ds(monkeypatch)
        s_staged = fit(config, ds, ds, str(tmp_path / "a"), writer=None)
        out = capsys.readouterr().out
        assert "Staged-epoch training" in out

        config_loop = {**config, "tpu": {"seed": 0, "fused_epoch": False}}
        s_loop = fit(config_loop, ds, ds, str(tmp_path / "b"), writer=None)
        # identical batch composition and step math; params agree to ~lr —
        # XLA schedules the scanned body differently from the per-batch jit
        # and Adam amplifies reordering noise early on (same tolerance and
        # rationale as test_fused_epoch_matches_loop; the tight per-step
        # loss comparison lives in test_staged_epoch_losses_match_loop)
        for a, b in zip(
            jax.tree_util.tree_leaves(s_staged.params),
            jax.tree_util.tree_leaves(s_loop.params),
        ):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-2, atol=2e-3
            )

    def test_staged_epoch_losses_match_loop(self, monkeypatch):
        """Per-step loss trajectory of the staged program == host per-batch
        loop to float noise (proves identical batch composition + PRNG,
        mirroring test_fused_epoch_matches_loop's assertion)."""
        from smokephysai_tpu.train.loop import (
            create_train_state,
            make_train_epoch_staged,
            make_train_step,
        )

        ds = self._host_ds(monkeypatch)
        B = 2
        state_a = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        state_b = create_train_state(
            TINY_CONFIG, jax.random.PRNGKey(0), steps_per_epoch=3
        )
        k = jax.random.PRNGKey(42)

        tstep = make_train_step(TINY_CONFIG["physics"])
        loop_losses = []
        for batch in ds.epoch_batches(k, B, shuffle=True):
            state_a, m = tstep(state_a, batch, k)
            loop_losses.append(float(m["total_loss"]))

        staged = jax.device_put(ds.stage_epoch(k, B))
        tepoch = make_train_epoch_staged(TINY_CONFIG["physics"])
        state_b, stacked = tepoch(state_b, staged, k)
        np.testing.assert_allclose(
            np.asarray(stacked["total_loss"]), loop_losses, rtol=2e-5
        )
        assert int(state_b.step) == int(state_a.step)
