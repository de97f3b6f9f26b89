"""IVF centroid maintenance under churn (VERDICT r3 #8).

Sustained online upserts against a frozen codebook degrade recall (new
topics land in stale clusters the probe misses) and latency (the
brute-forced tail grows).  The auto-rebuild triggers
(IVFIndex auto_rebuild_tail_frac / auto_rebuild_growth_frac) must bound
both WITHOUT any manual rebuild() call — the online-semantics bar set by
the reference's Qdrant upserts (/root/reference/ingest.py:171-175).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.ivf import IVFIndex


def _centers(rng, n_centers, d):
    c = rng.standard_normal((n_centers, d)).astype(np.float32)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def _draw(rng, centers, n):
    v = centers[rng.integers(0, len(centers), n)]
    v = v + 0.15 * rng.standard_normal(v.shape).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _flat(vecs, capacity):
    n, d = vecs.shape
    idx = FlatIndex(dim=d, capacity=capacity, tile=128, use_pallas=False)
    idx.upsert(
        [f"p{i}" for i in range(n)],
        vecs,
        [f"text {i}" for i in range(n)],
        [{"ticker": "AAPL", "document_type": "10-K"} for _ in range(n)],
    )
    return idx


def _recall_vs_exact(ivf, queries, k=15):
    """Fraction of the exact top-k the probed search returns."""
    flat = ivf.flat
    n = flat.n_valid
    emb = np.asarray(flat._emb[:n], np.float32)
    exact = np.argsort(-(queries @ emb.T), axis=1)[:, :k]
    qf = jnp.asarray(
        np.stack([np.full(len(queries), -1), np.full(len(queries), -1)], 1),
        jnp.int32,
    )
    _, rows = ivf.search_device(jnp.asarray(queries), qf, k)
    rows = np.asarray(rows)
    return float(np.mean([
        len(set(rows[i].tolist()) & set(exact[i].tolist())) / k
        for i in range(len(queries))
    ]))


def test_churn_recall_bounded_without_manual_rebuild(rng):
    """+75% corpus in batches, half of it from UNSEEN topic clusters.

    With maintenance on, recall vs the exact scan stays at the fresh-build
    level and the tail stays bounded; the growth trigger must have fired
    (observable as _built_n advancing past the initial build) with no
    rebuild() call from the test.
    """
    d = 64
    old_topics = _centers(rng, 16, d)
    new_topics = _centers(rng, 8, d)  # distribution shift
    base = _draw(rng, old_topics, 2048)
    flat = _flat(base, capacity=8192)
    ivf = IVFIndex(flat, tile=128)
    built0 = ivf._built_n
    assert built0 == 2048

    queries = np.concatenate(
        [_draw(rng, old_topics, 16), _draw(rng, new_topics, 16)]
    )
    fresh = _recall_vs_exact(ivf, queries[:16])

    recalls = []
    next_id = 2048
    for batch in range(6):  # 6 x 256 = +75% of the corpus
        mix = np.concatenate([
            _draw(rng, new_topics, 128), _draw(rng, old_topics, 128),
        ])
        ivf.upsert(
            [f"c{next_id + i}" for i in range(len(mix))],
            mix,
            [f"churn text {next_id + i}" for i in range(len(mix))],
            [{"ticker": "AAPL", "document_type": "10-Q"}] * len(mix),
        )
        next_id += len(mix)
        recalls.append(_recall_vs_exact(ivf, queries))

    assert ivf._built_n > built0, "growth trigger never fired"
    assert ivf.n_valid == 2048 + 6 * 256
    # drift bound: every post-churn measurement holds the fresh-build
    # quality (the probe path, tail merge, and refreshed codebook
    # together must not lose the new-topic rows)
    assert min(recalls) >= min(0.95, fresh - 0.02), (
        f"recall drifted under churn: {recalls} (fresh {fresh:.3f})"
    )
    # latency bound: the brute-forced tail is within the configured
    # fraction after maintenance
    assert len(ivf._tail_rows) <= max(
        ivf.tile, int(ivf.auto_rebuild_tail_frac * ivf.n_valid)
    )


def test_tail_trigger_compacts_overflow(rng):
    """Pinned-tiny c_max forces packed overflow; the tail trigger must
    rebuild (re-deriving capacity) instead of letting the tail grow
    unboundedly."""
    d = 32
    topics = _centers(rng, 8, d)
    base = _draw(rng, topics, 512)
    flat = _flat(base, capacity=4096)
    ivf = IVFIndex(flat, tile=128)
    # skew every new row into one topic: its cluster block must overflow
    skew = topics[:1]
    next_id = 512
    for _ in range(4):
        mix = _draw(rng, skew, 256)
        ivf.upsert(
            [f"s{next_id + i}" for i in range(len(mix))],
            mix,
            [f"skew text {next_id + i}" for i in range(len(mix))],
            [{"ticker": "AAPL", "document_type": "10-Q"}] * len(mix),
        )
        next_id += len(mix)
        assert len(ivf._tail_rows) <= max(
            ivf.tile, int(ivf.auto_rebuild_tail_frac * ivf.n_valid)
        ), f"tail unbounded: {len(ivf._tail_rows)} of {ivf.n_valid}"
    assert ivf._built_n > 512


def test_explicit_geometry_stays_pinned(rng):
    """Constructor-pinned n_clusters/nprobe survive an auto-rebuild."""
    d = 32
    vecs = _draw(rng, _centers(rng, 8, d), 512)
    flat = _flat(vecs, capacity=4096)
    ivf = IVFIndex(flat, n_clusters=8, nprobe=4, tile=128)
    more = _draw(rng, _centers(rng, 4, d), 512)  # +100% -> growth trigger
    ivf.upsert(
        [f"q{i}" for i in range(512)],
        more,
        [f"more text {i}" for i in range(512)],
        [{"ticker": "AAPL", "document_type": "10-Q"}] * 512,
    )
    assert ivf._built_n == 1024  # rebuild happened
    assert ivf.n_clusters == 8 and ivf.nprobe == 4


def test_disabled_triggers_keep_frozen_codebook(rng):
    d = 32
    vecs = _draw(rng, _centers(rng, 8, d), 512)
    flat = _flat(vecs, capacity=4096)
    ivf = IVFIndex(
        flat, tile=128,
        auto_rebuild_tail_frac=0.0, auto_rebuild_growth_frac=0.0,
    )
    more = _draw(rng, _centers(rng, 8, d), 512)
    ivf.upsert(
        [f"q{i}" for i in range(512)],
        more,
        [f"more text {i}" for i in range(512)],
        [{"ticker": "AAPL", "document_type": "10-Q"}] * 512,
    )
    assert ivf._built_n == 512  # no auto-rebuild
