"""IVF tier: k-means, packing invariants, recall vs flat, tail merge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.ivf import (
    IVFIndex,
    ivf_probe_pallas,
    ivf_probe_xla,
    spherical_kmeans,
)


def _clustered_corpus(rng, n=2000, d=64, n_centers=16):
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    idx = rng.integers(0, n_centers, n)
    v = centers[idx] + 0.15 * rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


def _flat(rng, vecs):
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


def test_kmeans_clusters(rng):
    vecs = _clustered_corpus(rng, n=800, d=32, n_centers=8)
    cent, assign = spherical_kmeans(jnp.asarray(vecs), 8, iters=15)
    cent, assign = np.asarray(cent), np.asarray(assign)
    np.testing.assert_allclose(np.linalg.norm(cent, axis=1), 1.0, rtol=1e-3)
    # points should align with their assigned centroid far better than
    # with a random one (noise norm here is ~0.57 of signal)
    own = np.sum(vecs * cent[assign], axis=1)
    rand = np.sum(vecs * cent[(assign + 3) % 8], axis=1)
    assert own.mean() > 0.7
    assert own.mean() > rand.mean() + 0.3


def test_ivf_recall_vs_flat(rng):
    vecs = _clustered_corpus(rng)
    flat = _flat(rng, vecs)
    ivf = IVFIndex(flat, n_clusters=16, nprobe=6, tile=128)
    assert not ivf._tail_rows or len(ivf._tail_rows) < 100

    q = vecs[:16] + 0.05 * rng.standard_normal((16, vecs.shape[1])).astype(
        np.float32
    )
    k = 10
    recalls = []
    for ticker in ["AAPL", None]:
        h_flat = flat.search(q, ticker=ticker, k=k)
        h_ivf = ivf.search(q, ticker=ticker, k=k)
        for hf, hi in zip(h_flat, h_ivf):
            truth = {x["row"] for x in hf}
            got = {x["row"] for x in hi}
            recalls.append(len(truth & got) / max(1, len(truth)))
    assert np.mean(recalls) > 0.9, np.mean(recalls)
    # top-1 should essentially always survive probing
    top1 = [
        hf[0]["row"] == hi[0]["row"]
        for hf, hi in zip(flat.search(q, k=k), ivf.search(q, k=k))
    ]
    assert np.mean(top1) >= 0.9


def test_ivf_pallas_interpret_matches_xla(rng):
    vecs = _clustered_corpus(rng, n=512, d=128, n_centers=4)
    flat = _flat(rng, vecs)
    ivf = IVFIndex(flat, n_clusters=4, nprobe=2, tile=128)
    q = jnp.asarray(vecs[:8])
    qf = jnp.asarray([[-1, -1]] * 8, jnp.int32)
    budget = ivf.num_tiles
    tile_ids = ivf._tile_list(q.astype(ivf.dtype), budget, ivf.centroids)
    args = (
        q.astype(ivf.dtype), qf, ivf.packed_emb, ivf.packed_codes,
        ivf.packed_gids, tile_ids, 5,
    )
    s_x, i_x = ivf_probe_xla(*args, tile=128)
    s_p, i_p = ivf_probe_pallas(
        *args, tile=128, probe_budget=budget, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(s_p), np.asarray(s_x), rtol=2e-2, atol=2e-2
    )
    gap_ok = np.all(np.diff(np.asarray(s_x), axis=1) < -5e-3, axis=1)
    np.testing.assert_array_equal(
        np.asarray(i_p)[gap_ok], np.asarray(i_x)[gap_ok]
    )


def test_ivf_online_upsert_enters_packing(rng):
    """New rows place into their nearest centroid's free packed slots —
    found by the PROBED search with an empty tail (Qdrant's immediate
    upsert semantics, VERDICT r2 item 3)."""
    vecs = _clustered_corpus(rng, n=500, d=32, n_centers=4)
    flat = _flat(rng, vecs)
    ivf = IVFIndex(flat, n_clusters=4, nprobe=4, tile=128)
    tail0 = len(ivf._tail_rows)

    new = rng.standard_normal((3, 32)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    ivf.upsert(
        ["n0", "n1", "n2"], new, ["t0", "t1", "t2"],
        [{"ticker": "NVDA", "document_type": "10-K"}] * 3,
    )
    assert len(ivf._tail_rows) == tail0  # online: no new tail rows
    state = ivf._state
    assert len(state[5]) == flat.n_valid  # assignment covers the new rows
    hits = ivf.search(new[0], ticker="NVDA", k=3)[0]
    assert hits and hits[0]["text"] == "t0"  # probed search finds them

    ivf.rebuild()
    hits = ivf.search(new[0], ticker="NVDA", k=3)[0]
    assert hits and hits[0]["text"] == "t0"


def test_ivf_online_upsert_spills_full_cluster(rng):
    """When a cluster's packed block is full the row spills to the tail
    (bounded memory waste, no recall loss) and rebuild() rebalances."""
    vecs = _clustered_corpus(rng, n=512, d=32, n_centers=2)
    flat = _flat(rng, vecs)
    # tiny c_max so clusters start (nearly) full
    ivf = IVFIndex(flat, n_clusters=2, nprobe=2, tile=128, c_max=128)
    fill0 = ivf._state[7].copy()
    n_new = (256 - int(fill0.sum())) + 8  # guarantee at least 8 spills
    new = rng.standard_normal((n_new, 32)).astype(np.float32)
    new /= np.linalg.norm(new, axis=1, keepdims=True)
    ivf.upsert(
        [f"s{i}" for i in range(n_new)], new,
        [f"spill {i}" for i in range(n_new)],
        [{"ticker": "NVDA", "document_type": "10-K"}] * n_new,
    )
    assert (ivf._state[7] <= 128).all()
    assert ivf._tail_rows  # overflow went to the tail
    # every new row is findable (packed or tail)
    hits = ivf.search(new[-1], ticker="NVDA", k=3)[0]
    assert hits and hits[0]["text"] == f"spill {n_new - 1}"
    ivf.rebuild()
    # c_max is fixed at init, so the corpus genuinely exceeds the packed
    # capacity here — rebuild rebalances but spills remain searchable
    hits = ivf.search(new[-1], ticker="NVDA", k=3)[0]
    assert hits and hits[0]["text"] == f"spill {n_new - 1}"


def test_save_load_round_trip(tmp_path):
    rng = np.random.default_rng(11)
    v = _clustered_corpus(rng, n=1000)
    flat = _flat(rng, v)
    ivf = IVFIndex(flat, nprobe=8, tile=128)
    q = v[:4] + 0.01
    before = ivf.search_batch(q, [(None, None)] * 4, k=5)
    ivf.save(str(tmp_path))

    from financial_rag_system_tpu.index.flat import FlatIndex

    flat2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    ivf2 = IVFIndex.load(str(tmp_path), flat2)
    after = ivf2.search_batch(q, [(None, None)] * 4, k=5)
    assert [[h["row"] for h in hl] for hl in before] == [
        [h["row"] for h in hl] for hl in after
    ]
    assert ivf2.n_clusters == ivf.n_clusters and ivf2.c_max == ivf.c_max


def test_load_rejects_stale_file(tmp_path):
    rng = np.random.default_rng(12)
    v = _clustered_corpus(rng, n=600)
    flat = _flat(rng, v)
    IVFIndex(flat, tile=128).save(str(tmp_path))
    small = _flat(rng, v[:100])
    small.save(str(tmp_path))

    from financial_rag_system_tpu.index.flat import FlatIndex

    flat2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="stale ivf"):
        IVFIndex.load(str(tmp_path), flat2)


def test_load_puts_newer_rows_in_tail(tmp_path):
    rng = np.random.default_rng(13)
    v = _clustered_corpus(rng, n=512)
    flat = _flat(rng, v)
    IVFIndex(flat, tile=128).save(str(tmp_path))
    # upsert after save, then save only the flat part
    nv = rng.standard_normal((1, v.shape[1])).astype(np.float32)
    nv /= np.linalg.norm(nv)
    flat.upsert(["extra"], nv, ["extra text"], [{"ticker": "NVDA"}])
    flat.save(str(tmp_path))

    from financial_rag_system_tpu.index.flat import FlatIndex

    flat2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    ivf2 = IVFIndex.load(str(tmp_path), flat2)
    assert ivf2._tail_rows == [512]
    hits = ivf2.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"


def test_reupsert_existing_id_serves_fresh_vector(rng):
    """Re-upserting an existing id must take effect immediately (Qdrant
    upserts do): the stale packed copy is masked and the row re-scores
    from the updated flat arrays via the tail until rebuild."""
    vecs = _clustered_corpus(rng, n=500, d=32, n_centers=4)
    flat = _flat(rng, vecs)
    ivf = IVFIndex(flat, n_clusters=4, nprobe=1, tile=128)

    # move p7 to a brand-new direction orthogonal-ish to the corpus
    nv = rng.standard_normal((1, 32)).astype(np.float32)
    nv /= np.linalg.norm(nv)
    ivf.upsert(["p7"], nv, ["fresh text"], [{"ticker": "AAPL",
                                             "document_type": "10-K"}])

    hits = ivf.search(nv, k=3)[0]
    assert hits and hits[0]["row"] == 7 and hits[0]["text"] == "fresh text"
    # the OLD location must no longer surface row 7 with a stale score:
    # nprobe=1 probes only the old cluster, where the slot is now masked
    old_hits = ivf.search(vecs[7], k=10)[0]
    for h in old_hits:
        if h["row"] == 7:
            # if row 7 appears it must carry the FRESH embedding's score
            want = float(np.dot(vecs[7], nv[0]))
            assert abs(h["score"] - want) < 0.05
    # a second re-upsert doesn't grow the packed mask bookkeeping wrongly
    ivf.upsert(["p7"], vecs[7:8], ["back again"], [{"ticker": "AAPL"}])
    hits = ivf.search(vecs[7], k=3)[0]
    assert hits and hits[0]["row"] == 7 and hits[0]["text"] == "back again"
    # rebuild folds everything back in
    ivf.rebuild()
    hits = ivf.search(vecs[7], k=3)[0]
    assert hits and hits[0]["row"] == 7


def test_filters_case_insensitive(rng):
    """Reference uppercases ticker/document_type at query time
    (main.py:221,228) and document_type at ingestion (ingest.py:162) —
    lowercase filter values must match."""
    vecs = _clustered_corpus(rng, n=300, d=32, n_centers=4)
    n = len(vecs)
    flat = FlatIndex(dim=32, capacity=n, tile=128, use_pallas=False)
    flat.upsert(
        [f"p{i}" for i in range(n)],
        vecs,
        [f"text {i}" for i in range(n)],
        [
            {"ticker": "aapl" if i % 2 else "AAPL",
             "document_type": "10-k" if i % 3 else "10-K"}
            for i in range(n)
        ],
    )
    up = flat.search(vecs[0], ticker="AAPL", document_type="10-K", k=10)[0]
    low = flat.search(vecs[0], ticker="aapl", document_type="10-k", k=10)[0]
    assert up and low
    assert [h["row"] for h in up] == [h["row"] for h in low]
    # mixed-case stored payloads all land under one code
    assert len(flat.store.tickers.to_code) == 1
    assert len(flat.store.doc_types.to_code) == 1
