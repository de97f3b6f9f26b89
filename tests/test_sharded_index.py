"""ShardedFlatIndex on the 8-virtual-device CPU mesh vs FlatIndex truth."""

import numpy as np
import pytest

import jax

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
from financial_rag_system_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    return create_mesh()


def _corpus(rng, n, d=64):
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    ids = [f"p{i}" for i in range(n)]
    texts = [f"text {i}" for i in range(n)]
    pays = [
        {"ticker": ["AAPL", "MSFT", "GOOG"][i % 3], "document_type": "10-K"}
        for i in range(n)
    ]
    return ids, v, texts, pays


def test_sharded_matches_flat(rng, mesh):
    n, d, k = 700, 64, 10
    ids, vecs, texts, pays = _corpus(rng, n, d)

    flat = FlatIndex(dim=d, capacity=1024, tile=128, use_pallas=False)
    flat.upsert(ids, vecs, texts, pays)

    sharded = ShardedFlatIndex(mesh, dim=d, capacity=1024, tile=128)
    sharded.upsert(ids, vecs, texts, pays)
    assert sharded.capacity % 8 == 0

    q = vecs[:4] + 0.01 * rng.standard_normal((4, d)).astype(np.float32)
    for ticker in ["AAPL", None]:
        h_flat = flat.search(q, ticker=ticker, k=k)
        h_shard = sharded.search(q, ticker=ticker, k=k)
        for hf, hs in zip(h_flat, h_shard):
            assert [x["row"] for x in hf] == [x["row"] for x in hs]
            np.testing.assert_allclose(
                [x["score"] for x in hf], [x["score"] for x in hs],
                rtol=2e-3, atol=2e-3,
            )


def test_sharded_growth(rng, mesh):
    d = 32
    sharded = ShardedFlatIndex(mesh, dim=d, capacity=1024, tile=128)
    cap0 = sharded.capacity
    ids, vecs, texts, pays = _corpus(rng, cap0 + 100, d)
    sharded.upsert(ids, vecs, texts, pays)
    assert sharded.capacity > cap0
    assert sharded.capacity % (8 * 128) == 0
    hits = sharded.search(vecs[cap0 + 50], k=3)[0]
    assert hits[0]["row"] == cap0 + 50


def test_sharded_filter_isolation(rng, mesh):
    d = 32
    ids, vecs, texts, pays = _corpus(rng, 300, d)
    sharded = ShardedFlatIndex(mesh, dim=d, capacity=1024, tile=128)
    sharded.upsert(ids, vecs, texts, pays)
    hits = sharded.search(vecs[0], ticker="MSFT", k=15)[0]
    assert hits and all(h["ticker"] == "MSFT" for h in hits)
