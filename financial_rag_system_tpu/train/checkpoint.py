"""Checkpoint/resume for model + optimizer state (orbax).

The reference has no model checkpointing at all — its durable state is
Docker volumes and re-downloadable pretrained weights (SURVEY.md §5.4).
Here fine-tuned bi-encoder params and optimizer state checkpoint through
orbax with step-addressed directories and latest-step resume; the index
itself checkpoints separately (FlatIndex.save / load).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_state(directory: str, step: int, state: dict[str, Any]) -> str:
    """Save a pytree state dict under ``directory/step_{step}``."""
    path = os.path.join(_abs(directory), f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def latest_step(directory: str) -> int | None:
    d = _abs(directory)
    if not os.path.isdir(d):
        return None
    steps = [
        int(name.split("_")[1])
        for name in os.listdir(d)
        if name.startswith("step_") and name.split("_")[1].isdigit()
    ]
    return max(steps) if steps else None


def restore_state(
    directory: str, step: int | None = None, *, target: dict[str, Any] | None = None
) -> tuple[int, dict[str, Any]] | None:
    """Restore (step, state); None if nothing is checkpointed.

    ``target`` (a matching pytree of arrays, e.g. freshly initialized
    params/opt_state) restores with correct shardings/dtypes.
    """
    s = step if step is not None else latest_step(directory)
    if s is None:
        return None
    path = os.path.join(_abs(directory), f"step_{s:08d}")
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        import jax

        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = ckptr.restore(path, abstract)
    else:
        state = ckptr.restore(path)
    return s, state
