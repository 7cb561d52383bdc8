"""Numeric sanitization (SURVEY.md §5 'race detection / sanitizers': the
functional-JAX equivalents — NaN debugging and checkify — replace native
sanitizers the reference never had)."""
from __future__ import annotations

import contextlib
from typing import Callable, Iterator

import jax
from jax.experimental import checkify


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Raise on the first NaN produced by any jitted computation."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable, errors=checkify.float_checks) -> Callable:
    """Wrap `fn` with checkify float checks (NaN/Inf/div) — returns a
    function whose first output is an error set to `.throw()` or inspect."""
    return checkify.checkify(fn, errors=errors)
