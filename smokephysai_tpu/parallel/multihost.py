"""Multi-host / multi-slice entry (SURVEY.md §7 layer 5: 'multi-host entry
via jax.distributed.initialize').

On Cloud TPU pods the coordinator/process env vars are auto-detected; on
other clusters pass them explicitly. After `initialize()`, `jax.devices()`
spans the whole pod and the existing mesh/sharding code works unchanged
(mesh axes laid out so collectives ride ICI within a slice and DCN across
slices)."""
from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Idempotent jax.distributed.initialize wrapper. No-ops on a single
    process with no coordinator configured."""
    if jax.process_count() > 1:
        return  # already initialised
    try:
        if coordinator_address is None and num_processes is None:
            jax.distributed.initialize()  # env/TPU auto-detection
        else:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
    except (RuntimeError, ValueError):
        # single-process run (no coordinator): proceed single-host
        pass


def is_primary() -> bool:
    """True on the process that should write checkpoints/logs."""
    return jax.process_index() == 0
