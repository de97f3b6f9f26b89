"""int8-quantized corpus: ranking parity, filters, tiers, persistence."""

import numpy as np
import pytest

import jax.numpy as jnp

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.hnsw import HNSWIndex
from financial_rag_system_tpu.index.ivf import IVFIndex


def _corpus(rng, n=2000, d=64, centers=32):
    c = rng.standard_normal((centers, d)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    v = c[rng.integers(0, centers, n)] + 0.15 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def _flat(vecs, dtype):
    n, d = vecs.shape
    idx = FlatIndex(dim=d, capacity=n, tile=128, use_pallas=False, dtype=dtype)
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


def _recall(a, b, k):
    return float(
        np.mean(
            [
                len({h["row"] for h in x} & {h["row"] for h in y}) / k
                for x, y in zip(a, b)
            ]
        )
    )


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    v = _corpus(rng)
    q = _corpus(rng, n=8)
    return v, q


def test_int8_ranking_parity_vs_f32(data):
    v, q = data
    f32 = _flat(v, jnp.float32)
    i8 = _flat(v, jnp.int8)
    assert i8.quantized and not f32.quantized
    fh = f32.search_batch(q, [(None, None)] * 8, k=10)
    ih = i8.search_batch(q, [(None, None)] * 8, k=10)
    # two-sided symmetric quantization adds ~1.6% score noise; clustered
    # corpora have near-ties at the top-k boundary, so parity is high but
    # not exact — 0.9375 measured on this seed
    assert _recall(ih, fh, 10) >= 0.9
    # int8 emb really is int8 in HBM (half of bf16)
    assert i8._emb.dtype == jnp.int8


def test_int8_filters(data):
    v, q = data
    i8 = _flat(v, jnp.int8)
    hits = i8.search_batch(q[:2], [("AAPL", None), ("MSFT", "10-K")], k=5)
    assert all(h["ticker"] == "AAPL" for h in hits[0])
    assert all(h["ticker"] == "MSFT" for h in hits[1])


def test_int8_save_load_round_trip(data, tmp_path):
    v, q = data
    i8 = _flat(v, jnp.int8)
    before = i8.search_batch(q, [(None, None)] * 8, k=5)
    i8.save(str(tmp_path))
    loaded = FlatIndex.load(str(tmp_path), use_pallas=False)
    assert loaded.quantized and loaded._emb.dtype == jnp.int8
    after = loaded.search_batch(q, [(None, None)] * 8, k=5)
    assert [[h["row"] for h in hl] for hl in before] == [
        [h["row"] for h in hl] for hl in after
    ]


def test_int8_ivf_tier(data):
    v, q = data
    i8 = _flat(v, jnp.int8)
    ivf = IVFIndex(i8, n_clusters=32, nprobe=8, tile=64)
    assert ivf.centroids.dtype == jnp.bfloat16  # not truncated to int8
    fh = i8.search_batch(q, [(None, None)] * 8, k=10)
    ih = ivf.search_batch(q, [(None, None)] * 8, k=10)
    assert _recall(ih, fh, 10) >= 0.85


def test_int8_hnsw_tier_and_tail_scale_consistency(data):
    v, q = data
    i8 = _flat(v, jnp.int8)
    hx = HNSWIndex(i8, m=16, ef=128, frontier=8)
    fh = i8.search_batch(q, [(None, None)] * 8, k=10)
    hh = hx.search_batch(q, [(None, None)] * 8, k=10)
    assert _recall(hh, fh, 10) >= 0.85
    # tail scores must share the walk's scale: a perfect-match tail row
    # must outrank every graph row for its own query
    nv = _corpus(np.random.default_rng(9), n=1)
    hx.upsert(["t0"], nv, ["tail text"], [{"ticker": "NVDA"}])
    hits = hx.search_batch(nv, [(None, None)], k=3)[0]
    assert hits and hits[0]["text"] == "tail text"


def test_int8_sharded_tier(data):
    """int8 corpus sharded over the mesh: ranking parity with bf16 + the
    doubled per-chip capacity really lands as int8 shards in HBM."""
    from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
    from financial_rag_system_tpu.index.sharded_ivf import ShardedIVFIndex
    from financial_rag_system_tpu.parallel.mesh import create_mesh

    v, q = data
    mesh = create_mesh("corpus:8")

    def _sharded(dtype):
        idx = ShardedFlatIndex(
            mesh, dim=v.shape[1], capacity=v.shape[0], tile=64, dtype=dtype
        )
        idx.upsert(
            [f"p{i}" for i in range(len(v))],
            v,
            [f"text {i}" for i in range(len(v))],
            [
                {"ticker": ["AAPL", "MSFT"][i % 2], "document_type": "10-K"}
                for i in range(len(v))
            ],
        )
        return idx

    bf = _sharded(jnp.bfloat16)
    i8 = _sharded(jnp.int8)
    assert i8.quantized and i8._emb.dtype == jnp.int8
    bh = bf.search_batch(q, [(None, None)] * 8, k=10)
    ih = i8.search_batch(q, [(None, None)] * 8, k=10)
    assert _recall(ih, bh, 10) >= 0.9
    # filters still apply under quantization
    fh = i8.search_batch(q[:1], [("AAPL", None)], k=5)
    assert all(h["ticker"] == "AAPL" for h in fh[0])
    # IVF tier over the int8 sharded corpus: centroids stay bf16
    ivf = ShardedIVFIndex(i8, n_clusters=16, nprobe=8, tile=16)
    assert ivf.centroids.dtype == jnp.bfloat16
    iv = ivf.search_batch(q, [(None, None)] * 8, k=10)
    assert _recall(iv, ih, 10) >= 0.85


def test_int8_ivf_save_load_keeps_probing(data, tmp_path):
    """Regression: loading an IVF over an int8 flat must not truncate the
    unit-norm centroids to int8 (which collapses cluster probing)."""
    v, q = data
    i8 = _flat(v, jnp.int8)
    ivf = IVFIndex(i8, n_clusters=32, nprobe=8, tile=64)
    before = ivf.search_batch(q, [(None, None)] * 8, k=10)
    ivf.save(str(tmp_path))
    flat2 = FlatIndex.load(str(tmp_path), use_pallas=False)
    ivf2 = IVFIndex.load(str(tmp_path), flat2)
    assert ivf2.centroids.dtype == jnp.bfloat16
    after = ivf2.search_batch(q, [(None, None)] * 8, k=10)
    assert [[h["row"] for h in hl] for hl in before] == [
        [h["row"] for h in hl] for hl in after
    ]


def _quantize(v):
    return np.clip(np.round(v * 127.0), -127, 127).astype(np.int8)


def test_int8_mxu_flat_kernel_bit_identical(data):
    """Native int8xint8->int32 MXU scoring (FRS_INT8_MXU) must produce
    bit-identical (scores, rows) to the widened-f32 path: int32
    accumulation is exact for |q|,|c| <= 127 at these dims."""
    from financial_rag_system_tpu.ops.topk import masked_topk_pallas

    v, q = data
    n, d = v.shape
    qi, ci = jnp.array(_quantize(q)), jnp.array(_quantize(v[:1024]))
    codes = jnp.array(
        np.stack(
            [
                np.arange(1024, dtype=np.int32) % 3,
                np.zeros(1024, dtype=np.int32),
            ]
        )
    )
    qf = jnp.array(
        np.stack(
            [np.arange(8, dtype=np.int32) % 3 - 1,
             np.full(8, -1, dtype=np.int32)],
            axis=1,
        )
    )
    s_mxu, i_mxu = masked_topk_pallas(
        qi, ci, codes, qf, 1000, 10, tile=256, interpret=True, int8_mxu=True
    )
    s_wide, i_wide = masked_topk_pallas(
        qi, ci, codes, qf, 1000, 10, tile=256, interpret=True, int8_mxu=False
    )
    np.testing.assert_array_equal(np.asarray(s_mxu), np.asarray(s_wide))
    np.testing.assert_array_equal(np.asarray(i_mxu), np.asarray(i_wide))


def test_int8_mxu_ivf_kernel_bit_identical(data):
    """The IVF probed-tiles kernel's int8 MXU path (mirrors the flat
    kernel) is exact: identical to both the widened path and the XLA
    gather-then-score reference."""
    from financial_rag_system_tpu.index.ivf import (
        ivf_probe_pallas,
        ivf_probe_xla,
    )

    v, q = data
    tile, num_tiles = 128, 8
    n = tile * num_tiles
    qi, ci = jnp.array(_quantize(q)), jnp.array(_quantize(v[:n]))
    codes = jnp.array(
        np.stack(
            [np.arange(n, dtype=np.int32) % 3, np.zeros(n, dtype=np.int32)]
        )
    )
    gids = jnp.array(np.arange(n, dtype=np.int32)[None, :])
    qf = jnp.array(
        np.stack(
            [np.arange(8, dtype=np.int32) % 3 - 1,
             np.full(8, -1, dtype=np.int32)],
            axis=1,
        )
    )
    # probe 5 of the 8 tiles, -1 padded to a budget of 6
    tids = jnp.array(np.array([0, 2, 3, 5, 7, -1], dtype=np.int32))
    s_mxu, i_mxu = ivf_probe_pallas(
        qi, qf, ci, codes, gids, tids, 10,
        tile=tile, probe_budget=6, interpret=True, int8_mxu=True,
    )
    s_wide, i_wide = ivf_probe_pallas(
        qi, qf, ci, codes, gids, tids, 10,
        tile=tile, probe_budget=6, interpret=True, int8_mxu=False,
    )
    np.testing.assert_array_equal(np.asarray(s_mxu), np.asarray(s_wide))
    np.testing.assert_array_equal(np.asarray(i_mxu), np.asarray(i_wide))
    s_ref, i_ref = ivf_probe_xla(
        qi, qf, ci, codes, gids, tids, 10, tile=tile
    )
    np.testing.assert_array_equal(np.asarray(s_mxu), np.asarray(s_ref))
    np.testing.assert_array_equal(np.asarray(i_mxu), np.asarray(i_ref))
