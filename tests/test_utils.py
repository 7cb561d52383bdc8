"""Utility-layer tests: config defaults/merge, profiling timer, checkify
sanitization (SURVEY.md §5 aux subsystems)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smokephysai_tpu.utils.config import DEFAULTS, load_config
from smokephysai_tpu.utils.debug import checked, debug_nans
from smokephysai_tpu.utils.profiling import Timer


class TestConfig:
    def test_defaults_complete(self):
        cfg = load_config(None)
        for section in ("data", "model", "physics", "training", "simulation",
                        "tpu"):
            assert section in cfg

    def test_partial_yaml_merges_over_defaults(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("model:\n  hidden_dim: 64\n")
        cfg = load_config(str(p))
        assert cfg["model"]["hidden_dim"] == 64
        assert cfg["model"]["num_layers"] == DEFAULTS["model"]["num_layers"]
        assert cfg["training"]["batch_size"] == 8

    def test_reference_schema_loads(self):
        cfg = load_config("config/config.yaml")
        assert cfg["data"]["grid_size"] == [128, 128]
        assert cfg["model"]["chaos_strength"] == 0.1
        assert cfg["simulation"]["dt"] == 0.01

    def test_apply_overrides_types_and_paths(self):
        from smokephysai_tpu.utils.config import apply_overrides

        cfg = load_config(None)
        apply_overrides(cfg, [
            "tpu.use_flash=false",
            "training.learning_rate=0.0005",
            "data.grid_size=[64, 64]",
            "new_section.key=hi",
        ])
        assert cfg["tpu"]["use_flash"] is False
        assert cfg["training"]["learning_rate"] == 0.0005
        assert cfg["data"]["grid_size"] == [64, 64]
        assert cfg["new_section"]["key"] == "hi"
        import pytest as _pytest

        with _pytest.raises(ValueError):
            apply_overrides(cfg, ["no_equals_sign"])


class TestProfiling:
    def test_timer_blocks_on_device(self):
        t = Timer()
        x = jnp.ones((64, 64))
        with t.measure(result=None):
            y = (x @ x).block_until_ready()
        assert t.p50_ms() is not None and t.p50_ms() >= 0


class TestSanitization:
    def test_debug_nans_raises(self):
        with pytest.raises(Exception):
            with debug_nans(True):
                jnp.log(jnp.array(-1.0)) * 2.0  # nan through a jit op
                jax.jit(lambda x: jnp.log(x))(jnp.array(-1.0)).block_until_ready()

    def test_checked_flags_nan(self):
        fn = checked(lambda x: jnp.log(x))
        err, out = fn(jnp.array(-1.0))
        assert "nan" in str(err.get()).lower()

    def test_checked_clean_passes(self):
        fn = checked(lambda x: jnp.log(x))
        err, out = fn(jnp.array(2.0))
        assert err.get() is None
        assert float(out) == pytest.approx(np.log(2.0))


class TestMultihost:
    def test_initialize_noops_single_process(self):
        import jax

        from smokephysai_tpu.parallel.multihost import initialize, is_primary

        initialize()  # must not raise on a single host
        assert jax.process_count() == 1
        assert is_primary()


class TestProfilingFlops:
    def test_flops_estimate_matmul(self):
        from smokephysai_tpu.utils.profiling import flops_estimate

        f = flops_estimate(
            lambda a, b: a @ b, jnp.ones((64, 128)), jnp.ones((128, 32))
        )
        assert f == pytest.approx(2 * 64 * 128 * 32, rel=0.01)

    def test_mfu_unknown_device_is_none_or_fraction(self):
        from smokephysai_tpu.utils.profiling import mfu

        u = mfu(1e12)
        assert u is None or 0 < u < 1


class TestCompileCache:
    def test_sync_cache_copies_missing_only(self, tmp_path):
        import os

        from smokephysai_tpu.utils.compile_cache import sync_cache

        src, dst = tmp_path / "src", tmp_path / "dst"
        src.mkdir()
        (src / "a").write_text("entry-a")
        (src / "b").write_text("entry-b")
        dst.mkdir()
        (dst / "b").write_text("existing-b-keep")
        sync_cache(str(src), str(dst))
        assert (dst / "a").read_text() == "entry-a"
        assert (dst / "b").read_text() == "existing-b-keep"  # not clobbered
        # missing src dir is a no-op, not an error
        sync_cache(str(tmp_path / "nope"), str(dst))
        assert sorted(os.listdir(dst)) == ["a", "b"]

    def test_enable_compile_cache_sets_jax_config(self):
        import jax

        from smokephysai_tpu.utils.compile_cache import (
            CACHE_DIRS,
            enable_compile_cache,
        )

        enable_compile_cache()
        assert jax.config.jax_compilation_cache_dir == CACHE_DIRS[0]
