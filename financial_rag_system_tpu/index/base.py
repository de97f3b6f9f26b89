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
    *,
    batch_limit: int | None = None,
) -> "np.ndarray | None":
    """Union of the batch's inverted lists for filters selective enough
    to score exactly (<= limit matching rows); None when no query
    qualifies.

    ``batch_limit`` caps the exact-scored union for the whole batch
    (default 4x the per-filter limit): smallest lists first, larger ones
    fall back to the ANN path — otherwise a 32-query batch of distinct
    near-limit tickers would brute-force a quarter of a 1M corpus.
    """
    if not host_codes:
        return None
    lists = []
    seen: set[int] = set()
    for tcode, _dt in host_codes:
        code = int(tcode)
        rows = rows_by_ticker.get(code)
        if rows is not None and len(rows) <= limit and code not in seen:
            seen.add(code)
            lists.append(rows)
    if not lists:
        return None
    cap = batch_limit if batch_limit is not None else 4 * limit
    lists.sort(key=len)
    union, total = [], 0
    for rows in lists:
        if total + len(rows) > cap and union:
            break
        union.append(rows)
        total += len(rows)
    return np.unique(np.concatenate(union))


def build_ticker_lists(flat, n: int) -> dict[int, "np.ndarray"]:
    """Inverted row lists per ticker code over rows [0, n) — one (n,)
    int32 host readback per build."""
    codes0 = np.asarray(flat._codes[0, :n])
    return {
        int(c): np.where(codes0 == c)[0].astype(np.int32)
        for c in np.unique(codes0)
    }


def score_rows(flat, rows: "np.ndarray", q_prepped, qf, k):
    """Exact masked top-k over an explicit row subset of a flat index
    (tail rows or selective-filter inverted lists).  ``q_prepped`` must
    already match the corpus representation (see FlatIndex.prep_queries)
    so scores share the ANN path's scale."""
    from financial_rag_system_tpu.ops.topk import NEG_INF, masked_topk_xla

    emb = flat._emb[jnp.asarray(rows)]
    codes = flat._codes[:, jnp.asarray(rows)]
    s, local = masked_topk_xla(
        q_prepped, emb, codes, qf, len(rows), min(k, len(rows))
    )
    gids = jnp.where(s > NEG_INF, jnp.asarray(rows, jnp.int32)[local], -1)
    return s, gids


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
