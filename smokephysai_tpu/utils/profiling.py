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
