"""Concurrency stress: searches keep serving during upserts and rebuilds.

The reference relies on "safety by construction" (single event loop +
thread offload, SURVEY.md §5.2).  This framework additionally mutates
index state from worker threads (POST /index/upsert, /index/rebuild run
in asyncio.to_thread), so the tier-swap paths must stay safe under real
thread interleaving: searches read one consistent graph/packing snapshot
while a rebuild replaces it.
"""

import threading

import numpy as np
import pytest

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.hnsw import HNSWIndex
from financial_rag_system_tpu.index.ivf import IVFIndex


def _mk(n=512, d=64, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    flat = FlatIndex(dim=d, capacity=4 * n, tile=128, use_pallas=False)
    flat.upsert(
        [f"p{i}" for i in range(n)], v, [f"text {i}" for i in range(n)],
        [{"ticker": ["AAPL", "MSFT"][i % 2], "document_type": "10-K"}
         for i in range(n)],
    )
    return flat, rng


@pytest.mark.slow
@pytest.mark.parametrize("tier", ["hnsw", "ivf"])
def test_search_serves_through_rebuild_and_upserts(tier):
    flat, rng = _mk()
    idx = (
        HNSWIndex(flat, m=8, ef=64, frontier=4)
        if tier == "hnsw"
        else IVFIndex(flat, tile=128)
    )
    q = rng.standard_normal((4, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    errors: list[BaseException] = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                hits = idx.search_batch(q, [(None, None)] * 4, k=5)
                assert len(hits) == 4
                for hl in hits:
                    rows = [h["row"] for h in hl]
                    assert len(rows) == len(set(rows))  # no dup rows
            except BaseException as exc:  # pragma: no cover — fail below
                errors.append(exc)
                return

    def mutator():
        try:
            for i in range(6):
                nv = rng.standard_normal((8, 64)).astype(np.float32)
                nv /= np.linalg.norm(nv, axis=1, keepdims=True)
                idx.upsert(
                    [f"x{i}_{j}" for j in range(8)], nv,
                    [f"new {i} {j}" for j in range(8)],
                    [{"ticker": "NVDA", "document_type": "10-Q"}] * 8,
                )
                idx.rebuild()
        except BaseException as exc:  # pragma: no cover
            errors.append(exc)

    searchers = [threading.Thread(target=searcher) for _ in range(3)]
    mut = threading.Thread(target=mutator)
    for t in searchers:
        t.start()
    mut.start()
    mut.join(timeout=300)
    stop.set()
    for t in searchers:
        t.join(timeout=60)
    assert not errors, errors[:1]
    # all upserted rows folded in by the final rebuild
    assert idx.n_valid == 512 + 6 * 8
    hits = idx.search_batch(q, [("NVDA", None)] * 4, k=5)
    assert all(h["ticker"] == "NVDA" for hl in hits for h in hl)
