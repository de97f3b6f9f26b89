"""Multi-host initialization (DCN scale-out).

The reference scales by adding Docker services on one box (SURVEY.md
§5.8); the TPU-native scale-out story is: every host in a pod slice runs
this process, ``jax.distributed.initialize`` wires them over DCN, the
global mesh spans all hosts' devices (corpus axis keeps riding ICI
within a slice), and exactly one host (process 0) owns the HTTP front —
the serving shell checks :func:`is_coordinator` before binding.

Controlled by the standard env vars (``JAX_COORDINATOR_ADDRESS``,
``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``) or explicit arguments; a
single-process run is a no-op, so the same entrypoint works everywhere.
"""

from __future__ import annotations

import os

import jax

_initialized = False


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Idempotent jax.distributed init. Returns True when multi-process."""
    global _initialized
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None:
        return False  # single-host run
    if _initialized:
        return True
    num_processes = num_processes or int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    process_id = (
        process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0"))
    )
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def is_coordinator() -> bool:
    """True on the process that should own the HTTP front (process 0)."""
    return jax.process_index() == 0
