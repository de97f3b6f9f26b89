"""Online HNSW insert (native incremental path, VERDICT r2 item 3):
upserts after build enter the graph in O(log N) via hnsw.cpp
frs_hnsw_add instead of piling into a brute-forced tail, and only the
changed adjacency rows are re-shipped to the device."""

import numpy as np
import pytest

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.hnsw import HNSWIndex


def _corpus(rng, n, d=64, centers=24):
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    v = c[rng.integers(0, centers, n)] + 0.15 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _flat(v, capacity=None, **kw):
    n, d = v.shape
    flat = FlatIndex(
        d, capacity=capacity or n, tile=128, use_pallas=False, **kw
    )
    flat.upsert(
        [f"p{i}" for i in range(n)], v, [f"text {i}" for i in range(n)],
        [
            {"ticker": ["AAPL", "MSFT"][i % 2], "document_type": "10-K"}
            for i in range(n)
        ],
    )
    return flat


@pytest.fixture()
def built(rng):
    v = _corpus(rng, 1024)
    flat = _flat(v, capacity=2048)
    hx = HNSWIndex(flat, m=8, ef=64, frontier=4)
    if hx._native is None:
        pytest.skip("native HNSW builder unavailable")
    return hx, v


def test_upsert_enters_graph_without_tail(built, rng):
    """The VERDICT done-when: an upsert-after-build row is found via the
    WALK with _tail_rows == []."""
    hx, _v = built
    assert not hx._tail_rows
    n0 = hx.n_graph
    nv = _corpus(rng, 4)
    hx.upsert(
        [f"x{i}" for i in range(4)], nv, [f"new {i}" for i in range(4)],
        [{"ticker": "NVDA", "document_type": "10-K"}] * 4,
    )
    assert hx._tail_rows == []          # no brute tail
    assert hx.n_graph == n0 + 4         # rows are IN the graph
    hits = hx.search_batch(nv, [(None, None)] * 4, k=5)
    for i, hl in enumerate(hits):
        assert hl and hl[0]["row"] == n0 + i  # self-lookup via the walk


def test_online_insert_selective_filter_sees_new_rows(built, rng):
    hx, _v = built
    nv = _corpus(rng, 2)
    hx.upsert(
        ["s0", "s1"], nv, ["sel 0", "sel 1"],
        [{"ticker": "RARE", "document_type": "10-K"}] * 2,
    )
    # RARE has 2 rows => selective exact path; the inverted lists must
    # have been extended for the inserted rows
    hits = hx.search_batch(nv[:1], [("RARE", None)], k=2)[0]
    assert {h["ticker"] for h in hits} == {"RARE"}
    assert len(hits) == 2


def test_bulk_online_insert_recall_matches_fresh_build(rng):
    v = _corpus(rng, 1536)
    flat = _flat(v[:1024], capacity=2048)
    hx = HNSWIndex(flat, m=8, ef=64, frontier=4)
    if hx._native is None:
        pytest.skip("native HNSW builder unavailable")
    hx.upsert(
        [f"b{i}" for i in range(512)], v[1024:],
        [f"bulk {i}" for i in range(512)],
        [{"ticker": "AAPL", "document_type": "10-K"}] * 512,
    )
    assert not hx._tail_rows and hx.n_graph == 1536
    q = _corpus(rng, 8)
    fh = flat.search_batch(q, [(None, None)] * 8, k=10)
    hh = hx.search_batch(q, [(None, None)] * 8, k=10)
    rec = np.mean(
        [
            len({h["row"] for h in hh[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(8)
        ]
    )
    assert rec >= 0.9, rec


def test_capacity_growth_falls_back_to_tail(built, rng):
    """Rows past the flat capacity would alias the walk's sentinel: they
    must tail until rebuild(), never corrupt the online graph."""
    hx, _v = built
    cap = hx.flat.capacity
    n_extra = cap - hx.flat.n_valid + 8  # force a capacity double
    nv = _corpus(rng, n_extra)
    hx.upsert(
        [f"g{i}" for i in range(n_extra)], nv,
        [f"grow {i}" for i in range(n_extra)],
        [{"ticker": "GROW", "document_type": "10-K"}] * n_extra,
    )
    assert hx.flat.capacity > cap
    assert hx._tail_rows  # online insert refused, tail took the rows
    hits = hx.search_batch(nv[-1:], [("GROW", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "GROW"  # tail merge still serves
    hx.rebuild()
    assert not hx._tail_rows
    hits = hx.search_batch(nv[-1:], [("GROW", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "GROW"


def test_save_load_includes_online_inserts(built, rng, tmp_path):
    hx, _v = built
    nv = _corpus(rng, 8)
    hx.upsert(
        [f"o{i}" for i in range(8)], nv, [f"online {i}" for i in range(8)],
        [{"ticker": "NVDA", "document_type": "10-K"}] * 8,
    )
    hx.save(str(tmp_path))
    flat2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    hx2 = HNSWIndex.load(str(tmp_path), flat2)
    assert hx2.n_graph == hx.n_graph  # inserted rows persisted IN-graph
    assert not hx2._tail_rows
    hits = hx2.search_batch(nv[:1], [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"


def test_rebuild_is_optional_compaction(built, rng):
    hx, _v = built
    nv = _corpus(rng, 16)
    hx.upsert(
        [f"c{i}" for i in range(16)], nv, [f"compact {i}" for i in range(16)],
        [{"ticker": "AAPL", "document_type": "10-K"}] * 16,
    )
    n = hx.n_graph
    hx.rebuild()
    assert hx.n_graph == n and not hx._tail_rows
    hits = hx.search_batch(nv[:1], [(None, None)], k=3)[0]
    assert hits and hits[0]["row"] == n - 16
