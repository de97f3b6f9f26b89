"""Device timing helpers that are honest on asynchronous runtimes.

On this environment's tunneled TPU runtime, ``block_until_ready`` can
return before execution completes and a single synchronous fetch costs
~30 ms of round-trip latency, so naive per-call timing is wrong in both
directions.  Two meaningful measurements:

- :func:`fetched_ms` — latency of one call *including* the host fetch of
  its (small) outputs: what a single request experiences.
- :func:`sustained_ms` — steady-state throughput with ``depth`` calls in
  flight and a rotating fetch: what the serving pipeline experiences
  under load.  Wall clock over many reps, so runtime async tricks can't
  inflate it.
"""

from __future__ import annotations

import time
from typing import Any, Callable

import numpy as np

import jax


def _fetch(out: Any) -> None:
    for leaf in jax.tree.leaves(out):
        np.asarray(leaf)


def fetched_ms(fn: Callable[[], Any], *, reps: int = 20, warmup: int = 2) -> float:
    for _ in range(warmup):
        _fetch(fn())
    t0 = time.time()
    for _ in range(reps):
        _fetch(fn())
    return (time.time() - t0) / reps * 1e3


def concurrent_ms(
    fn: Callable[[], Any], *, workers: int = 16, reps: int = 48, warmup: int = 2
) -> float:
    """Steady-state per-call wall time with results fetched from a thread
    pool — host round-trip latency overlaps across in-flight calls, which
    is exactly what the async serving shell does with its batches."""
    from concurrent.futures import ThreadPoolExecutor

    for _ in range(warmup):
        _fetch(fn())
    with ThreadPoolExecutor(workers) as ex:
        t0 = time.time()
        futs = [ex.submit(_fetch, fn()) for _ in range(reps)]
        for f in futs:
            f.result()
        return (time.time() - t0) / reps * 1e3


def sustained_ms(
    fn: Callable[[], Any], *, depth: int = 4, reps: int = 40, warmup: int = 2
) -> float:
    for _ in range(warmup):
        _fetch(fn())
    inflight = [fn() for _ in range(depth)]
    t0 = time.time()
    for _ in range(reps):
        inflight.append(fn())
        _fetch(inflight.pop(0))
    for out in inflight:
        _fetch(out)
    return (time.time() - t0) / (reps + depth) * 1e3
