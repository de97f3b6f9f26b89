"""Shared search surface for the index engines.

Provides the host-level API over any engine that exposes
``search_device(query_vecs, query_filter, k)`` and a ``store``:
single-filter search (the reference's per-request retrieval,
main.py:215-239) and batched per-query-filter search (the TPU-native
addition: the whole dynamic batch retrieves in ONE device pass even when
every request filters a different ticker).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp


_BATCH_BUCKETS = (1, 2, 4, 8, 16, 32, 64, 128)


def _bucket(b: int) -> int:
    for x in _BATCH_BUCKETS:
        if b <= x:
            return x
    return ((b + 127) // 128) * 128


class SearchMixin:
    store: Any  # DocumentStore

    def search_device(
        self,
        query_vecs: jax.Array,
        query_filter: jax.Array,
        k: int,
        *,
        host_codes: list[tuple[int, int]] | None = None,
    ) -> tuple[jax.Array, jax.Array]:
        """host_codes mirrors query_filter on the host so engines can make
        selectivity decisions without a device round-trip."""
        raise NotImplementedError

    def _hits(self, scores: np.ndarray, rows: np.ndarray) -> list[list[dict]]:
        out: list[list[dict]] = []
        for bi in range(scores.shape[0]):
            hits = []
            for s, r in zip(scores[bi], rows[bi]):
                if not np.isfinite(s):
                    continue
                payload = self.store.get(int(r))
                payload["score"] = float(s)
                payload["row"] = int(r)
                hits.append(payload)
            out.append(hits)
        return out

    def search_batch(
        self,
        query_vecs: np.ndarray | jax.Array,
        filters: Sequence[tuple[str | None, str | None]],
        k: int = 15,
    ) -> list[list[dict[str, Any]]]:
        """One device pass for a mixed-filter batch.

        filters[i] = (ticker, document_type) for query i; None = wildcard.
        """
        q = np.asarray(query_vecs, np.float32)
        if q.ndim == 1:
            q = q[None, :]
        b = q.shape[0]
        assert b == len(filters)
        # pad the batch dim to a bucket so jit compiles once per bucket,
        # not once per arriving batch size (dynamic batching + static shapes)
        bpad = _bucket(b)
        if bpad != b:
            q = np.concatenate([q, np.zeros((bpad - b, q.shape[1]), np.float32)])
        codes = [self.store.query_codes(t, d) for t, d in filters]
        codes += [(-3, -3)] * (bpad - b)  # padding queries match nothing
        scores, rows = self.search_device(
            jnp.asarray(q), jnp.asarray(codes, jnp.int32), k,
            host_codes=codes,
        )
        return self._hits(np.asarray(scores)[:b], np.asarray(rows)[:b])

    def search(
        self,
        query_vecs: np.ndarray | jax.Array,
        *,
        ticker: str | None = None,
        document_type: str | None = None,
        k: int = 15,
    ) -> list[list[dict[str, Any]]]:
        q = jnp.asarray(query_vecs)
        if q.ndim == 1:
            q = q[None, :]
        return self.search_batch(
            q, [(ticker, document_type)] * q.shape[0], k
        )
