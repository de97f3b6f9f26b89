"""Sharded HNSW: per-shard graph recall, filters, tail, growth fallback,
persistence — on the virtual 8-device CPU mesh (conftest)."""

import numpy as np
import pytest

from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
from financial_rag_system_tpu.index.sharded_hnsw import ShardedHNSWIndex
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


def _populated(mesh, rng, n=4096, d=64, **flat_kw):
    v = _clustered(rng, n, d)
    flat = ShardedFlatIndex(mesh, dim=d, capacity=n, tile=64, **flat_kw)
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


def test_recall_vs_sharded_flat(mesh):
    rng = np.random.default_rng(1)
    flat, v = _populated(mesh, rng)
    hnsw = ShardedHNSWIndex(flat)
    q = _clustered(rng, 8)
    fh = flat.search_batch(q, [(None, None)] * 8, k=10)
    hh = hnsw.search_batch(q, [(None, None)] * 8, k=10)
    rec = np.mean(
        [
            len({h["row"] for h in hh[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(8)
        ]
    )
    assert rec >= 0.9, rec


def test_filters_respected(mesh):
    rng = np.random.default_rng(2)
    flat, _ = _populated(mesh, rng, n=2048)
    hnsw = ShardedHNSWIndex(flat)
    q = _clustered(rng, 4)
    hits = hnsw.search_batch(
        q, [("AAPL", None), ("MSFT", None), (None, None), ("AAPL", "10-K")],
        k=5,
    )
    assert all(h["ticker"] == "AAPL" for h in hits[0])
    assert all(h["ticker"] == "MSFT" for h in hits[1])
    assert all(h["ticker"] == "AAPL" for h in hits[3])


def test_selective_filter_exact_path(mesh):
    """A minority ticker must not lose recall to the graph walk."""
    rng = np.random.default_rng(5)
    n = 2048
    v = _clustered(rng, n)
    flat = ShardedFlatIndex(mesh, dim=64, capacity=n, tile=64)
    flat.upsert(
        [f"p{i}" for i in range(n)], v, [f"text {i}" for i in range(n)],
        [
            {"ticker": "RARE" if i % 32 == 0 else "COMMON",
             "document_type": "10-K"}
            for i in range(n)
        ],
    )
    hnsw = ShardedHNSWIndex(flat)
    q = _clustered(rng, 8)
    fh = flat.search_batch(q, [("RARE", None)] * 8, k=10)
    hh = hnsw.search_batch(q, [("RARE", None)] * 8, k=10)
    assert all(h["ticker"] == "RARE" for hl in hh for h in hl)
    rec = np.mean(
        [
            len({h["row"] for h in hh[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(8)
        ]
    )
    assert rec == 1.0  # exact path: full recall


def test_tail_upsert_then_rebuild(mesh):
    rng = np.random.default_rng(3)
    flat, _ = _populated(mesh, rng, n=1024)
    hnsw = ShardedHNSWIndex(flat)
    nv = _clustered(rng, 1)
    hnsw.upsert(["x0"], nv, ["new text"], [{"ticker": "NVDA"}])
    hits = hnsw.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"
    hnsw.rebuild()
    assert not hnsw._tail_rows
    assert hnsw.n_graph == 1025
    hits = hnsw.search_batch(nv, [("NVDA", None)], k=3)[0]
    assert hits and hits[0]["ticker"] == "NVDA"


def test_capacity_growth_falls_back_to_exact(mesh):
    """A capacity-growing upsert invalidates the block geometry: search
    must serve exact sharded-flat results (never walk a stale graph),
    and rebuild() restores the graph tier."""
    rng = np.random.default_rng(4)
    n = 1024
    flat, _ = _populated(mesh, rng, n=n)
    hnsw = ShardedHNSWIndex(flat)
    built_cap = hnsw._graph_state[4]
    # grow: push past capacity so ShardedFlatIndex doubles its blocks
    extra = _clustered(rng, n + 64)
    hnsw.upsert(
        [f"g{i}" for i in range(n + 64)],
        extra,
        [f"grown {i}" for i in range(n + 64)],
        [{"ticker": "GROW", "document_type": "10-K"}] * (n + 64),
    )
    assert flat.capacity > built_cap
    q = _clustered(rng, 4)
    fh = flat.search_batch(q, [(None, None)] * 4, k=10)
    hh = hnsw.search_batch(q, [(None, None)] * 4, k=10)
    for i in range(4):  # exact fallback == exact flat, rows and order
        assert [h["row"] for h in hh[i]] == [h["row"] for h in fh[i]]
    hnsw.rebuild()
    assert hnsw._graph_state[4] == flat.capacity
    assert hnsw.n_graph == flat.n_valid
    hh = hnsw.search_batch(q, [(None, None)] * 4, k=10)
    rec = np.mean(
        [
            len({h["row"] for h in hh[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(4)
        ]
    )
    assert rec >= 0.9, rec


def test_walk_cache_keyed_by_geometry(mesh):
    """Regression (ADVICE r2 high): make_sharded_walk bakes per_shard in
    as a Python constant (global-id stride AND pad sentinel).  After a
    capacity-growing upsert + rebuild(), a search with a previously-used
    k must NOT reuse the program traced for the old geometry — row ids
    would silently alias."""
    rng = np.random.default_rng(11)
    n = 1024
    flat, _ = _populated(mesh, rng, n=n)
    hnsw = ShardedHNSWIndex(flat)
    q = _clustered(rng, 4)
    hnsw.search_batch(q, [(None, None)] * 4, k=10)  # caches (10, old geom)
    per_shard0 = hnsw._graph_state[2]
    take0 = hnsw._graph_state[7]
    assert (10, per_shard0, take0) in hnsw._walk_cache

    extra = _clustered(rng, n + 64)
    hnsw.upsert(
        [f"g{i}" for i in range(n + 64)], extra,
        [f"grown {i}" for i in range(n + 64)],
        [{"ticker": "GROW", "document_type": "10-K"}] * (n + 64),
    )
    hnsw.rebuild()
    per_shard1 = hnsw._graph_state[2]
    take1 = hnsw._graph_state[7]
    assert per_shard1 != per_shard0  # geometry really changed

    fh = flat.search_batch(q, [(None, None)] * 4, k=10)
    hh = hnsw.search_batch(q, [(None, None)] * 4, k=10)  # same k as before
    assert (10, per_shard1, take1) in hnsw._walk_cache
    for hl in hh:
        assert all(0 <= h["row"] < flat.n_valid for h in hl)
    rec = np.mean(
        [
            len({h["row"] for h in hh[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(4)
        ]
    )
    assert rec >= 0.85, rec


def test_partial_and_empty_shards(mesh):
    """Block layout fills shard 0 first: a small corpus leaves most
    shards empty — they must contribute nothing, not garbage."""
    rng = np.random.default_rng(6)
    n = 300
    v = _clustered(rng, n)
    flat = ShardedFlatIndex(mesh, dim=64, capacity=4096, tile=64)
    flat.upsert(
        [f"p{i}" for i in range(n)], v, [f"text {i}" for i in range(n)],
        [{"ticker": "AAPL", "document_type": "10-K"}] * n,
    )
    assert flat.capacity // flat.n_shards >= n  # all rows on shard 0
    hnsw = ShardedHNSWIndex(flat)
    hits = hnsw.search_batch(v[:3], [(None, None)] * 3, k=5)
    for i, hl in enumerate(hits):
        assert hl and hl[0]["row"] == i  # self-lookup wins
        assert all(0 <= h["row"] < 300 for h in hl)


def test_save_load_roundtrip(mesh, tmp_path):
    rng = np.random.default_rng(7)
    flat, v = _populated(mesh, rng, n=1024)
    hnsw = ShardedHNSWIndex(flat)
    q = _clustered(rng, 4)
    before = hnsw.search_batch(q, [(None, None)] * 4, k=10)
    hnsw.save(str(tmp_path))
    flat2 = ShardedFlatIndex.load(str(tmp_path), mesh)
    hnsw2 = ShardedHNSWIndex.load(str(tmp_path), flat2)
    after = hnsw2.search_batch(q, [(None, None)] * 4, k=10)
    for i in range(4):
        assert [h["row"] for h in before[i]] == [h["row"] for h in after[i]]


def test_quantized_corpus(mesh):
    import jax.numpy as jnp

    rng = np.random.default_rng(8)
    flat, v = _populated(mesh, rng, n=1024, dtype=jnp.int8)
    assert flat.quantized
    hnsw = ShardedHNSWIndex(flat)
    q = _clustered(rng, 8)
    fh = flat.search_batch(q, [(None, None)] * 8, k=10)
    hh = hnsw.search_batch(q, [(None, None)] * 8, k=10)
    rec = np.mean(
        [
            len({h["row"] for h in hh[i]} & {h["row"] for h in fh[i]}) / 10
            for i in range(8)
        ]
    )
    assert rec >= 0.85, rec


def test_rebuild_tier_op_promotes_and_switches(mesh):
    """The control-plane tier op handles hnsw: promote, rebuild, switch."""
    from financial_rag_system_tpu.index.sharded_ivf import ShardedIVFIndex
    from financial_rag_system_tpu.parallel.control import _rebuild_tier

    rng = np.random.default_rng(9)
    flat, _ = _populated(mesh, rng, n=1024)
    idx = _rebuild_tier(flat, "hnsw")
    assert isinstance(idx, ShardedHNSWIndex)
    same = _rebuild_tier(idx, "hnsw")
    assert same is idx  # in-place rebuild
    ivf = _rebuild_tier(idx, "ivf")
    assert isinstance(ivf, ShardedIVFIndex)
    back = _rebuild_tier(ivf, "hnsw")
    assert isinstance(back, ShardedHNSWIndex)
