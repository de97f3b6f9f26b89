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


def merge_candidates(
    s: jax.Array, i: jax.Array, extras, k: int
) -> tuple[jax.Array, jax.Array]:
    """Merge (B,k) primary results with extra (scores, ids) candidate sets,
    masking duplicate (query, row) pairs BEFORE the final top-k so a row
    reached by two paths can't crowd out distinct rows.  Candidate width
    stays O(k * paths), so the pairwise compare is tiny."""
    import jax.numpy as jnp

    from financial_rag_system_tpu.ops.topk import NEG_INF

    if not extras:
        return s, i
    for s_e, i_e in extras:
        s = jnp.concatenate([s, s_e], axis=1)
        i = jnp.concatenate([i, i_e], axis=1)
    eq = (i[:, :, None] == i[:, None, :]) & (i[:, :, None] >= 0)
    earlier = jnp.tril(jnp.ones_like(eq, dtype=bool), k=-1)
    is_dup = jnp.any(eq & earlier, axis=2)
    s = jnp.where(is_dup, NEG_INF, s)
    i = jnp.where(is_dup, -1, i)
    s, pos = jax.lax.top_k(s, k)
    i = jnp.take_along_axis(i, pos, axis=1)
    return s, i


def selective_rows(
    rows_by_ticker: dict[int, "np.ndarray"],
    host_codes,
    limit: int,
) -> "np.ndarray | None":
    """Union of the batch's inverted lists for filters selective enough
    to score exactly (<= limit matching rows); None when no query
    qualifies."""
    if not host_codes:
        return None
    union = []
    for tcode, _dt in host_codes:
        rows = rows_by_ticker.get(int(tcode))
        if rows is not None and len(rows) <= limit:
            union.append(rows)
    if not union:
        return None
    return np.unique(np.concatenate(union))


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
