"""Test config: force CPU with 8 virtual devices so the full test suite —
including mesh/sharding/halo-exchange tests (SURVEY.md §4) — runs anywhere
without TPU hardware.

Note: the environment preloads an `axon` TPU plugin that prepends itself to
JAX_PLATFORMS, so env vars alone don't stick; we override via jax.config
before any backend is initialised.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
