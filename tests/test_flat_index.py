"""FlatIndex: upsert idempotence, filtering, growth, persistence."""

import numpy as np

from financial_rag_system_tpu.index.flat import FlatIndex


def _mk_vec(rng, n, d=64):
    v = rng.standard_normal((n, d)).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _payload(ticker, dt="10-K", i=0):
    return {"ticker": ticker, "document_type": dt, "source_file": f"f{i}.html"}


def test_upsert_and_search(rng):
    idx = FlatIndex(dim=64, capacity=256, tile=128, use_pallas=False)
    vecs = _mk_vec(rng, 10)
    ids = [f"id{i}" for i in range(10)]
    texts = [f"text {i}" for i in range(10)]
    pays = [_payload("AAPL" if i < 5 else "MSFT", i=i) for i in range(10)]
    assert idx.upsert(ids, vecs, texts, pays) == 10
    assert idx.n_valid == 10

    # query with the exact vector of row 3 -> top hit is row 3
    hits = idx.search(vecs[3], ticker="AAPL", k=5)[0]
    assert hits[0]["row"] == 3
    assert hits[0]["score"] > 0.99
    assert all(h["ticker"] == "AAPL" for h in hits)

    # MSFT filter excludes AAPL rows
    hits = idx.search(vecs[3], ticker="MSFT", k=5)[0]
    assert all(h["ticker"] == "MSFT" for h in hits)

    # unknown ticker matches nothing
    assert idx.search(vecs[3], ticker="NVDA", k=5)[0] == []

    # wildcard ticker searches everything
    hits = idx.search(vecs[7], k=10)[0]
    assert hits[0]["row"] == 7


def test_upsert_idempotent(rng):
    idx = FlatIndex(dim=64, capacity=256, tile=128, use_pallas=False)
    vecs = _mk_vec(rng, 4)
    ids = ["a", "b", "c", "a"]  # duplicate id in one batch
    n_new = idx.upsert(ids, vecs, ["1", "2", "3", "4"], [_payload("AAPL")] * 4)
    assert n_new == 3
    assert idx.n_valid == 3
    # re-upsert same ids: no growth, text overwritten
    idx.upsert(["b"], vecs[:1], ["updated"], [_payload("AAPL")])
    assert idx.n_valid == 3
    row = idx.store.id_to_row["b"]
    assert idx.store.texts[row] == "updated"


def test_growth(rng):
    idx = FlatIndex(dim=32, capacity=128, tile=128, use_pallas=False)
    vecs = _mk_vec(rng, 300, d=32)
    idx.upsert(
        [f"i{i}" for i in range(300)],
        vecs,
        [f"t{i}" for i in range(300)],
        [_payload("AAPL", i=i) for i in range(300)],
    )
    assert idx.capacity >= 300
    assert idx.capacity % idx.tile == 0
    hits = idx.search(vecs[250], ticker="AAPL", k=3)[0]
    assert hits[0]["row"] == 250


def test_doc_type_filter(rng):
    idx = FlatIndex(dim=32, capacity=128, tile=128, use_pallas=False)
    vecs = _mk_vec(rng, 6, d=32)
    pays = [_payload("AAPL", dt="10-K" if i % 2 else "10-Q", i=i) for i in range(6)]
    idx.upsert([f"i{i}" for i in range(6)], vecs, ["t"] * 6, pays)
    hits = idx.search(vecs[0], ticker="AAPL", document_type="10-Q", k=6)[0]
    assert {h["document_type"] for h in hits} == {"10-Q"}


def test_persistence(rng, tmp_path):
    idx = FlatIndex(dim=32, capacity=128, tile=128, use_pallas=False)
    vecs = _mk_vec(rng, 8, d=32)
    idx.upsert(
        [f"i{i}" for i in range(8)], vecs, [f"t{i}" for i in range(8)],
        [_payload("AAPL", i=i) for i in range(8)],
    )
    idx.save(str(tmp_path))
    idx2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    assert idx2.n_valid == 8
    h1 = idx.search(vecs[2], ticker="AAPL", k=3)[0]
    h2 = idx2.search(vecs[2], ticker="AAPL", k=3)[0]
    assert [h["row"] for h in h1] == [h["row"] for h in h2]
    # upsert into the loaded index keeps id bookkeeping
    idx2.upsert(["i2"], vecs[:1], ["new"], [_payload("AAPL")])
    assert idx2.n_valid == 8
