"""Device mesh construction and axis conventions.

The reference has no multi-device compute at all (SURVEY.md §2,
"Parallelism statement") — its scaling story is HTTP fan-out to a Qdrant
server.  Here the corpus itself is the sharded dimension:

- ``corpus`` axis: corpus rows (chunk embeddings) are sharded across
  devices; each device computes a local top-k over its shard and results
  merge with an ``all_gather`` over ICI (see index/sharded.py).
- ``data`` axis: query-batch data parallelism for embedding / rerank
  forward passes and for the contrastive fine-tune step (train/).

Both axes live on one mesh; by default all devices go to ``corpus``
(retrieval-dominated serving).  ``RAG_TPU_MESH="data:2,corpus:4"``
overrides.  Tests force an 8-device CPU mesh via
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` — the same
"flag swaps the backend, test the real control plane" philosophy as the
reference's TESTING shim (reference tests.py:8-9).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_CORPUS = "corpus"


def _parse_mesh_shape(spec: str) -> dict[str, int]:
    """Parse "data:2,corpus:4" into {"data": 2, "corpus": 4}."""
    out: dict[str, int] = {}
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        name, _, size = part.partition(":")
        out[name.strip()] = int(size)
    return out


def create_mesh(
    spec: str = "",
    *,
    devices: list[jax.Device] | None = None,
) -> Mesh:
    """Build the framework mesh.

    With no spec, all devices are assigned to the ``corpus`` axis and
    ``data`` is size 1 (serving default: shard the index, replicate the
    small encoder weights).
    """
    devs = devices if devices is not None else jax.devices()
    n = len(devs)
    if spec:
        shape = _parse_mesh_shape(spec)
        data = shape.get(AXIS_DATA, 1)
        corpus = shape.get(AXIS_CORPUS, n // max(data, 1))
    else:
        data, corpus = 1, n
    if data * corpus != n:
        raise ValueError(
            f"mesh {AXIS_DATA}:{data} x {AXIS_CORPUS}:{corpus} != {n} devices"
        )
    arr = np.asarray(devs).reshape(data, corpus)
    return Mesh(arr, (AXIS_DATA, AXIS_CORPUS))


def local_mesh(n: int | None = None) -> Mesh:
    """Mesh over the first ``n`` local devices, all on ``corpus``."""
    devs = jax.devices()
    if n is not None:
        devs = devs[:n]
    return create_mesh(devices=devs)
