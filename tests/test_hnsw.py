"""HNSW tier: native/fallback build, walk recall, filters, tail, persistence."""

import numpy as np
import pytest

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.hnsw import (
    HNSWIndex,
    build_knn_graph,
    hnsw_walk,
)


def _corpus(rng, n=2000, d=64):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _flat(vecs):
    n, d = vecs.shape
    idx = FlatIndex(dim=d, capacity=n, tile=128, use_pallas=False)
    idx.upsert(
        [f"p{i}" for i in range(n)],
        vecs,
        [f"text {i}" for i in range(n)],
        [
            {"ticker": ["AAPL", "MSFT"][i % 2], "document_type": "10-K"}
            for i in range(n)
        ],
    )
    return idx


def _queries(rng, b=8, d=64):
    q = rng.standard_normal((b, d)).astype(np.float32)
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def _recall(hits_a, hits_b, k):
    per = [
        len({h["row"] for h in ha} & {h["row"] for h in hb}) / k
        for ha, hb in zip(hits_a, hits_b)
    ]
    return float(np.mean(per))


def test_knn_fallback_graph_shape():
    rng = np.random.default_rng(0)
    v = _corpus(rng, n=300)
    adj, ent = build_knn_graph(v, m=8, entries_cap=16)
    assert adj.shape == (300, 16)
    assert adj.dtype == np.int32
    # no self-loops, valid ids
    assert all(adj[i, 0] != i for i in range(300))
    assert adj.max() < 300 and ent.shape[0] == 16


def test_recall_vs_flat_unfiltered():
    rng = np.random.default_rng(1)
    v = _corpus(rng)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=16, ef=128, frontier=8)
    q = _queries(rng)
    fh = flat.search_batch(q, [(None, None)] * 8, k=10)
    hh = hx.search_batch(q, [(None, None)] * 8, k=10)
    assert _recall(hh, fh, 10) >= 0.9


def test_filtered_search_respects_filter_and_recalls():
    rng = np.random.default_rng(2)
    v = _corpus(rng)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=16, ef=128, frontier=8)
    q = _queries(rng)
    fh = flat.search_batch(q, [("AAPL", None)] * 8, k=10)
    hh = hx.search_batch(q, [("AAPL", None)] * 8, k=10)
    assert all(h["ticker"] == "AAPL" for hits in hh for h in hits)
    assert _recall(hh, fh, 10) >= 0.8


def test_mixed_filter_batch():
    rng = np.random.default_rng(3)
    v = _corpus(rng, n=1000)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=16, ef=96, frontier=8)
    q = _queries(rng, b=4)
    filters = [("AAPL", None), ("MSFT", None), (None, None), ("AAPL", "10-K")]
    hh = hx.search_batch(q, filters, k=5)
    assert all(h["ticker"] == "AAPL" for h in hh[0])
    assert all(h["ticker"] == "MSFT" for h in hh[1])
    assert all(h["ticker"] == "AAPL" for h in hh[3])


def test_no_duplicate_rows_in_results():
    rng = np.random.default_rng(4)
    v = _corpus(rng, n=1000)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=16, ef=128, frontier=8)
    q = _queries(rng, b=8)
    hh = hx.search_batch(q, [(None, None)] * 8, k=10)
    for hits in hh:
        rows = [h["row"] for h in hits]
        assert len(rows) == len(set(rows))


def test_tail_upsert_and_rebuild():
    rng = np.random.default_rng(5)
    v = _corpus(rng, n=512)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=8, ef=64, frontier=4)
    # upsert a distinctive new vector; must surface via the tail
    nv = _queries(rng, b=1)
    hx.upsert(["new0"], nv, ["new text"], [{"ticker": "NVDA"}])
    assert len(hx._tail_rows) == 1
    hits = hx.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"
    assert hits[0]["score"] == pytest.approx(1.0, abs=5e-2)
    # rebuild folds the tail into the graph
    hx.rebuild()
    assert not hx._tail_rows and hx.n_graph == 513
    hits = hx.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"


def test_save_load_round_trip(tmp_path):
    rng = np.random.default_rng(6)
    v = _corpus(rng, n=512)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=8, ef=64, frontier=4)
    q = _queries(rng, b=4)
    before = hx.search_batch(q, [(None, None)] * 4, k=5)
    hx.save(str(tmp_path))
    flat2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    hx2 = HNSWIndex.load(str(tmp_path), flat2)
    after = hx2.search_batch(q, [(None, None)] * 4, k=5)
    assert [[h["row"] for h in hits] for hits in before] == [
        [h["row"] for h in hits] for hits in after
    ]


def test_walk_static_shapes_and_empty_filter():
    """A filter matching nothing returns zero hits, not garbage."""
    rng = np.random.default_rng(7)
    v = _corpus(rng, n=256)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=8, ef=64, frontier=4)
    q = _queries(rng, b=2)
    hits = hx.search_batch(q, [("NOPE", None)] * 2, k=5)
    assert hits == [[], []]


def test_engine_promote_to_hnsw():
    from financial_rag_system_tpu.serving.engine import RAGEngine
    from financial_rag_system_tpu.utils.config import get_config

    rng = np.random.default_rng(8)
    cfg = get_config()
    flat = FlatIndex(dim=cfg.embed_dim, capacity=512, tile=128,
                     use_pallas=False)
    from financial_rag_system_tpu.models.embedder import get_embedder
    from financial_rag_system_tpu.models.reranker import get_reranker

    emb = get_embedder(cfg.embed_dim)
    v = emb.encode([f"chunk about revenue {i}" for i in range(64)])
    flat.upsert(
        [f"p{i}" for i in range(64)],
        v,
        [f"chunk about revenue {i}" for i in range(64)],
        [{"ticker": "AAPL", "document_type": "10-K"}] * 64,
    )
    eng = RAGEngine(cfg, flat, emb, get_reranker(testing=True),
                    mode="sequential")
    out = eng.rebuild_index("hnsw")
    assert out["status"] == "ok" and out["tier"] == "HNSWIndex"
    # and back through the generic path: rebuild keeps the tier
    out = eng.rebuild_index()
    assert out["tier"] == "HNSWIndex"


def test_stale_graph_file_rejected(tmp_path):
    """A graph saved over a larger corpus must not load over a smaller one."""
    rng = np.random.default_rng(9)
    v = _corpus(rng, n=512)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=8, ef=64, frontier=4)
    hx.save(str(tmp_path))
    # simulate a later save under a smaller corpus: shrink the flat index
    small = _flat(v[:128])
    small.save(str(tmp_path))
    flat2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    with pytest.raises(ValueError, match="stale graph"):
        HNSWIndex.load(str(tmp_path), flat2)


def test_rebuild_keeps_tail_visible_until_swap():
    rng = np.random.default_rng(10)
    v = _corpus(rng, n=256)
    flat = _flat(v)
    hx = HNSWIndex(flat, m=8, ef=64, frontier=4)
    nv = _queries(rng, b=1)
    hx.upsert(["new0"], nv, ["new text"], [{"ticker": "NVDA"}])

    # during _build the old tail must still serve; emulate by querying
    # between _build() and the snapshot swap via the rebuild internals
    state = hx._build()
    hits = hx.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"  # old tail still live
    hx._graph_state, hx._tail_rows = state, list(
        range(state[2], hx.flat.n_valid)
    )
    assert not hx._tail_rows
    hits = hx.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"  # now in the graph


def test_selective_filter_exact_path():
    """A minority ticker (5% of rows) must not lose recall to the walk."""
    rng = np.random.default_rng(11)
    v = _corpus(rng, n=2000)
    flat = FlatIndex(dim=64, capacity=2000, tile=128, use_pallas=False)
    flat.upsert(
        [f"p{i}" for i in range(2000)], v, [f"text {i}" for i in range(2000)],
        [
            {"ticker": "RARE" if i % 20 == 0 else "COMMON",
             "document_type": "10-K"}
            for i in range(2000)
        ],
    )
    hx = HNSWIndex(flat, m=16, ef=64, frontier=4)
    q = _queries(rng, b=8)
    fh = flat.search_batch(q, [("RARE", None)] * 8, k=10)
    hh = hx.search_batch(q, [("RARE", None)] * 8, k=10)
    assert all(h["ticker"] == "RARE" for hl in hh for h in hl)
    assert _recall(hh, fh, 10) == 1.0  # exact path: full recall
    # no duplicate rows when a row reaches both the walk and the list
    for hl in hh:
        rows = [h["row"] for h in hl]
        assert len(rows) == len(set(rows))


def test_hier_descend_routes_to_outlier_island():
    """Long-range routing regression (the 1M trained-eval collapse,
    VERDICT r2 aftermath): targets that live in a tiny outlier island
    with no similarity gradient from the corpus bulk are unreachable by
    a budget-bounded level-0 walk from fixed entries, and reachable once
    the upper-level descent seeds the walk (index/hnsw.py hier_descend).
    Mirrors Qdrant's full-hierarchy search (reference main.py:215-239)."""
    from financial_rag_system_tpu.native.loader import native_enabled

    if not native_enabled():
        pytest.skip("needs the native builder (hierarchy export)")
    rng = np.random.default_rng(11)
    d = 32
    n_island, n_bulk = 64, 20_000
    bulk = rng.standard_normal((n_bulk, d)).astype(np.float32)
    axis = np.zeros(d, np.float32)
    axis[0] = 1.0
    bulk -= np.outer(bulk @ axis, axis)  # bulk orthogonal to the island
    island = axis[None, :] + 0.05 * rng.standard_normal((n_island, d)).astype(
        np.float32
    )
    # island FIRST (the hard corpus's layout: positives precede filler),
    # so later bulk insertions prune away most island backlinks
    v = np.concatenate([island, bulk])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    flat = _flat(v)
    # tiny budget: ~300 explored of 20k — entry luck cannot cover it
    hx = HNSWIndex(flat, m=16, ef=32, frontier=2, steps=4, entries_cap=4)
    assert hx.native_built
    hier = hx._graph_state[6]
    assert hier is not None
    # precondition: the island is represented in the hierarchy
    hi_ids = np.asarray(hier[0][: hier[2]])
    assert (hi_ids < n_island).sum() >= 1

    # queries point at the island but carry a decoy bulk-subspace
    # component: the level-0 walk has a confident WRONG gradient to climb
    decoy = rng.standard_normal((8, d)).astype(np.float32)
    decoy -= np.outer(decoy @ axis, axis)
    decoy /= np.linalg.norm(decoy, axis=1, keepdims=True)
    q = axis[None, :] + 0.4 * decoy
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    with_aids = hx.search_batch(q, [(None, None)] * 8, k=5)
    hit_with = np.mean([
        np.mean([h["row"] < n_island for h in hl]) for hl in with_aids
    ])
    # disable BOTH routing aids (snapshot surgery) and re-search: the
    # bare level-0 walk from fixed entries is the round-2 behavior that
    # collapsed at the 1M trained tier
    hx._graph_state = hx._graph_state[:6] + (None, None)
    without = hx.search_batch(q, [(None, None)] * 8, k=5)
    hit_without = np.mean([
        np.mean([h["row"] < n_island for h in hl]) for hl in without
    ])
    assert hit_with >= 0.9, f"routing aids failed: {hit_with}"
    assert hit_with > hit_without, (hit_with, hit_without)
