"""Persistent XLA compilation cache shared by every CLI.

Through the axon tunnel a single remote compile can take tens of seconds
to minutes (and the service intermittently degrades to ~60-100 s even for
trivial programs — observed 2026-08-19 23:15). The dozen model/solver
program variants the CLIs compile dominate their wall-clock; a warm cache
cuts repeat runs to pure measurement/step time.

Primary dir is repo-local (``cache/xla`` survives /tmp wipes on machine
restarts); a /tmp mirror re-seeds it if cache/ was cleaned instead. Both
directions are synced so one surviving copy restores the other.

No reference analog (the reference has no compilation step); this is
TPU-operations infrastructure.
"""
import os
import shutil

CACHE_DIRS = (
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "cache", "xla"),
    "/tmp/jax_comp_cache",
)


def sync_cache(src: str, dst: str) -> None:
    """Copy cache entries missing from dst (cheap: skips existing files)."""
    try:
        os.makedirs(dst, exist_ok=True)
        have = set(os.listdir(dst))
        for f in os.listdir(src):
            if f not in have:
                shutil.copy(os.path.join(src, f), os.path.join(dst, f))
    except OSError:
        pass


def backup_cache() -> None:
    """Mirror fresh repo-local entries to /tmp (call after heavy compiles)."""
    sync_cache(CACHE_DIRS[0], CACHE_DIRS[1])


def enable_compile_cache() -> None:
    """Turn on JAX's persistent compilation cache (idempotent; must run
    before backend init to be fully effective, but is safe any time)."""
    try:
        import jax

        sync_cache(CACHE_DIRS[1], CACHE_DIRS[0])
        jax.config.update("jax_compilation_cache_dir", CACHE_DIRS[0])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # unsupported backend/jax version: compile as usual
