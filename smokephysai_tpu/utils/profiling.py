"""Tracing / profiling utilities (SURVEY.md §5: the reference has only
wall-clock time.time() deltas, benchmark.py:131-133).

Offers: jax.profiler trace contexts (Perfetto-compatible), named scopes for
the solver stages, and a block-until-ready timer for honest accelerator
timings.
"""
from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a device trace viewable in Perfetto/TensorBoard:

        with profiling.trace("/tmp/trace"):
            run_hot_path()
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def named_scope(name: str):
    """jax.named_scope passthrough — annotates HLO for profiler readability
    (used around solver stages)."""
    return jax.named_scope(name)


class Timer:
    """Wall-clock timer that blocks on device completion, so timings mean
    what they say (unlike the reference's async-unaware time.time())."""

    def __init__(self):
        self.times: list[float] = []

    @contextlib.contextmanager
    def measure(self, result=None) -> Iterator[None]:
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.times.append(time.perf_counter() - t0)

    def p50_ms(self) -> Optional[float]:
        if not self.times:
            return None
        s = sorted(self.times)
        return 1000.0 * s[len(s) // 2]


def flops_estimate(fn, *args, **kwargs) -> Optional[float]:
    """XLA's compiled-program FLOP estimate for `fn(*args)` — the numerator
    of an honest MFU number. Returns None when the backend's cost analysis
    is unavailable (some plugin backends)."""
    try:
        cost = jax.jit(fn).lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        return float(cost["flops"])
    except Exception:
        return None


# bf16 peak TFLOPS per chip for common TPU generations (public specs);
# used to turn flops/sec into model FLOPS utilisation (MFU)
TPU_BF16_PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5 lite": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
}


def mfu(flops_per_sec: float, device=None) -> Optional[float]:
    """flops/sec -> fraction of one chip's bf16 peak. Device kind is
    matched against TPU_BF16_PEAK_TFLOPS; None if unknown."""
    kind = (device or jax.devices()[0]).device_kind.lower()
    for key, peak in TPU_BF16_PEAK_TFLOPS.items():
        if key in kind:
            return flops_per_sec / (peak * 1e12)
    return None
