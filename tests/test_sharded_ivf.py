"""Sharded IVF: packing invariants, recall vs sharded flat, tail, filters."""

import numpy as np
import pytest

import jax

from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
from financial_rag_system_tpu.index.sharded_ivf import ShardedIVFIndex
from financial_rag_system_tpu.parallel.mesh import create_mesh


@pytest.fixture(scope="module")
def mesh():
    return create_mesh("corpus:8")


def _clustered(rng, n, d=64, centers=32):
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    v = c[rng.integers(0, centers, n)] + 0.15 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _populated(mesh, rng, n=4096, d=64):
    v = _clustered(rng, n, d)
    flat = ShardedFlatIndex(mesh, dim=d, capacity=n, tile=64)
    flat.upsert(
        [f"p{i}" for i in range(n)],
        v,
        [f"text {i}" for i in range(n)],
        [
            {"ticker": ["AAPL", "MSFT"][i % 2], "document_type": "10-K"}
            for i in range(n)
        ],
    )
    return flat, v


def test_packing_covers_all_rows_or_tail(mesh):
    rng = np.random.default_rng(0)
    flat, _ = _populated(mesh, rng)
    ivf = ShardedIVFIndex(flat, n_clusters=32, nprobe=8, tile=64)
    packed = int(np.sum(np.asarray(ivf.packed_gids) >= 0))
    assert packed + len(ivf._tail_rows) == flat.n_valid
    # every packed gid unique
    gids = np.asarray(ivf.packed_gids)[0]
    gids = gids[gids >= 0]
    assert len(gids) == len(set(gids.tolist()))


def test_recall_vs_sharded_flat(mesh):
    rng = np.random.default_rng(1)
    flat, v = _populated(mesh, rng)
    ivf = ShardedIVFIndex(flat, n_clusters=32, nprobe=8, tile=64)
    q = _clustered(rng, 8)
    fh = flat.search_batch(q, [(None, None)] * 8, k=10)
    ih = ivf.search_batch(q, [(None, None)] * 8, k=10)
    rec = np.mean(
        [
            len({h["row"] for h in ih[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(8)
        ]
    )
    assert rec >= 0.9, rec


def test_filters_respected(mesh):
    rng = np.random.default_rng(2)
    flat, _ = _populated(mesh, rng, n=2048)
    ivf = ShardedIVFIndex(flat, n_clusters=16, nprobe=8, tile=64)
    q = _clustered(rng, 4)
    hits = ivf.search_batch(
        q, [("AAPL", None), ("MSFT", None), (None, None), ("AAPL", "10-K")],
        k=5,
    )
    assert all(h["ticker"] == "AAPL" for h in hits[0])
    assert all(h["ticker"] == "MSFT" for h in hits[1])
    assert all(h["ticker"] == "AAPL" for h in hits[3])


def test_tail_upsert_then_rebuild(mesh):
    rng = np.random.default_rng(3)
    flat, _ = _populated(mesh, rng, n=1024)
    ivf = ShardedIVFIndex(flat, n_clusters=16, nprobe=8, tile=64)
    nv = _clustered(rng, 1)
    ivf.upsert(["x0"], nv, ["new text"], [{"ticker": "NVDA"}])
    hits = ivf.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"
    ivf.rebuild()
    assert not [r for r in ivf._tail_rows if r >= 1025]
    hits = ivf.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"


def test_selective_filter_exact_path(mesh):
    """A minority ticker must not lose recall to cluster probing."""
    rng = np.random.default_rng(5)
    v = _clustered(rng, 2048)
    flat = ShardedFlatIndex(mesh, dim=64, capacity=2048, tile=64)
    flat.upsert(
        [f"p{i}" for i in range(2048)], v, [f"text {i}" for i in range(2048)],
        [
            {"ticker": "RARE" if i % 32 == 0 else "COMMON",
             "document_type": "10-K"}
            for i in range(2048)
        ],
    )
    ivf = ShardedIVFIndex(flat, n_clusters=32, nprobe=4, tile=64)
    q = _clustered(rng, 8)
    fh = flat.search_batch(q, [("RARE", None)] * 8, k=10)
    ih = ivf.search_batch(q, [("RARE", None)] * 8, k=10)
    assert all(h["ticker"] == "RARE" for hl in ih for h in hl)
    rec = np.mean(
        [
            len({h["row"] for h in ih[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(8)
        ]
    )
    assert rec == 1.0  # exact path: full recall
