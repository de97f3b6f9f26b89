"""Sharded fused two-stage query equals the single-device fused program."""

import numpy as np

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.ops.fused_query import (
    fused_two_stage,
    make_sharded_fused_query,
)
from financial_rag_system_tpu.parallel.mesh import create_mesh

TINY_EMBED = bert.BertConfig(
    vocab_size=2048, hidden=32, layers=1, heads=2, intermediate=64,
    max_positions=64, with_pooler=True,
)
TINY_CROSS = bert.BertConfig(
    vocab_size=2048, hidden=32, layers=1, heads=2, intermediate=64,
    max_positions=128, with_pooler=True, num_labels=1,
)


def test_sharded_fused_matches_single():
    mesh = create_mesh()  # 8 devices on corpus
    k, tile, b, lq, dlen, d = 7, 64, 4, 16, 32, 32
    n = 8 * tile * 2  # 2 tiles per shard

    rng = np.random.default_rng(0)
    ep = bert.init_params(jax.random.PRNGKey(0), TINY_EMBED)
    rp = bert.init_params(jax.random.PRNGKey(1), TINY_CROSS)
    q_ids = jnp.asarray(rng.integers(103, 2000, (b, lq)), jnp.int32)
    q_types = jnp.zeros_like(q_ids)
    q_mask = jnp.ones_like(q_ids)
    qf = jnp.asarray(
        np.stack([rng.integers(0, 3, b), np.full(b, -1)], axis=1), jnp.int32
    )
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    emb_j = jnp.asarray(emb)
    codes = jnp.asarray(
        np.stack([rng.integers(0, 3, n), rng.integers(0, 2, n)]), jnp.int32
    )
    dtok = jnp.asarray(rng.integers(103, 2000, (n, dlen)), jnp.int32)
    n_valid = jnp.asarray(n - 37, jnp.int32)

    rows_1, bi_1, ce_1 = fused_two_stage(
        ep, rp, q_ids, q_types, q_mask, qf, emb_j, codes, dtok, n_valid,
        embed_cfg=TINY_EMBED, rerank_cfg=TINY_CROSS,
        k=k, tile=tile, use_pallas=False,
    )

    sharded = make_sharded_fused_query(
        mesh, TINY_EMBED, TINY_CROSS, k=k, tile=tile, use_pallas=False
    )
    rows_s, bi_s, ce_s = sharded(
        ep, rp, q_ids, q_types, q_mask, qf, emb_j, codes, dtok, n_valid
    )

    np.testing.assert_allclose(
        np.asarray(bi_s), np.asarray(bi_1), rtol=2e-3, atol=2e-3
    )
    # where bi gaps beat numeric noise, candidate sets and ce scores agree
    gap_ok = np.all(np.diff(np.asarray(bi_1), axis=1) < -5e-3, axis=1)
    np.testing.assert_array_equal(
        np.asarray(rows_s)[gap_ok], np.asarray(rows_1)[gap_ok]
    )
    np.testing.assert_allclose(
        np.asarray(ce_s)[gap_ok], np.asarray(ce_1)[gap_ok],
        rtol=2e-2, atol=2e-2,
    )


def test_balanced_rerank_matches_cross_rerank_skewed():
    """_sharded_balanced_rerank == _cross_rerank even when every merged
    candidate lives on ONE shard (worst-case ownership skew for the psum
    token fetch), with empty slots present and B*k (15) not divisible by
    the shard count (8) — the even pair split pads with clipped
    duplicates that must not leak into the output."""
    from jax.sharding import PartitionSpec as P

    from financial_rag_system_tpu.ops.fused_query import (
        _cross_rerank,
        _sharded_balanced_rerank,
    )
    from financial_rag_system_tpu.parallel.mesh import AXIS_CORPUS

    mesh = create_mesh()
    s = mesh.shape[AXIS_CORPUS]
    b, k, lq, dlen, per_shard = 3, 5, 16, 32, 16
    n = s * per_shard
    rng = np.random.default_rng(3)
    rp = bert.init_params(jax.random.PRNGKey(1), TINY_CROSS)
    q_ids = jnp.asarray(rng.integers(103, 2000, (b, lq)), jnp.int32)
    dtok = jnp.asarray(rng.integers(103, 2000, (n, dlen)), jnp.int32)
    # all candidates on shard 0; one empty slot per query
    rows = rng.integers(0, per_shard, (b, k)).astype(np.int32)
    rows[:, -1] = -1
    bi = rng.standard_normal((b, k)).astype(np.float32)
    bi[:, -1] = -np.inf
    rows_j, bi_j = jnp.asarray(rows), jnp.asarray(bi)

    single = _cross_rerank(
        rp, q_ids, rows_j, bi_j, dtok, rerank_cfg=TINY_CROSS
    )

    def local(q_ids, g_rows, top_bi, dtok_shard):
        sid = jax.lax.axis_index(AXIS_CORPUS)
        local_rows = jnp.where(g_rows >= 0, g_rows - sid * per_shard, -1)
        return _sharded_balanced_rerank(
            rp, q_ids, g_rows, top_bi, local_rows, dtok_shard,
            axis=AXIS_CORPUS, n_shards=s, rerank_cfg=TINY_CROSS,
        )

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS_CORPUS, None)),
        out_specs=P(), check_vma=False,
    )
    sharded = fn(q_ids, rows_j, bi_j, dtok)
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), rtol=2e-4, atol=2e-4
    )
    assert np.all(np.isneginf(np.asarray(sharded)[:, -1]))


# ---------------------------------------------------------------------------
# engine-level: multi-device serving fuses when the full stack is present
# ---------------------------------------------------------------------------


def _sharded_engine(tmp_path, *, dtype=None):
    from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
    from financial_rag_system_tpu.models.embedder import BiEncoder
    from financial_rag_system_tpu.models.reranker import CrossEncoderReranker
    from financial_rag_system_tpu.models.tokenizer import Tokenizer
    from financial_rag_system_tpu.serving.engine import RAGEngine
    from financial_rag_system_tpu.utils.config import Config

    docs = [
        ("Apple revenue grew 8 percent on iphone demand", "AAPL"),
        ("Apple services margin expanded again this quarter", "AAPL"),
        ("Microsoft cloud revenue grew 24 percent", "MSFT"),
        ("Microsoft operating income rose on azure", "MSFT"),
        ("Apple supply chain concentration remains a risk", "AAPL"),
        ("Nvidia data center revenue tripled", "NVDA"),
    ]
    tok = Tokenizer()
    import jax

    embedder = BiEncoder(
        bert.init_params(jax.random.PRNGKey(0), TINY_EMBED),
        TINY_EMBED, tok, pooling="cls", max_len=64,
    )
    reranker = CrossEncoderReranker(
        bert.init_params(jax.random.PRNGKey(1), TINY_CROSS),
        TINY_CROSS, tok, max_len=160,
    )
    mesh = create_mesh()
    kw = {"dtype": dtype} if dtype is not None else {}
    index = ShardedFlatIndex(
        mesh, 32, capacity=512, tile=64, token_store_len=96, tokenizer=tok,
        **kw,
    )
    vecs = embedder.encode([d for d, _ in docs])
    index.upsert(
        [f"d{i}" for i in range(len(docs))], vecs, [d for d, _ in docs],
        [
            {"ticker": t, "document_type": "10-Q", "source_file": f"f{i}"}
            for i, (_, t) in enumerate(docs)
        ],
    )
    cfg = Config(
        testing=True, database_url=":memory:", batch_window_s=0.01,
        breaker_state_path=str(tmp_path / "cb.json"), embed_dim=32,
    )
    return RAGEngine(cfg, index, embedder, reranker, mode="sequential")


def test_sharded_engine_fused_matches_staged(tmp_path):
    eng = _sharded_engine(tmp_path)
    assert eng._fused_fn is not None and eng._fused_kind == "full"
    queries = ["apple services margin", "microsoft cloud growth"]
    filters = [("AAPL", None), ("MSFT", None)]
    fused = eng._fused_batch(queries, filters)
    staged = eng._embed_retrieve_batch(queries, filters)
    for (_fv, f_hits), (_sv, s_hits) in zip(fused, staged):
        assert [h["row"] for h in f_hits] == [h["row"] for h in s_hits]
        assert all("rerank_score" in h for h in f_hits)
        assert all(h["ticker"] in ("AAPL", "MSFT") for h in f_hits)


def test_sharded_engine_fused_quantized(tmp_path):
    import jax.numpy as jnp

    eng = _sharded_engine(tmp_path, dtype=jnp.int8)
    assert eng.index.quantized
    assert eng._fused_fn is not None and eng._fused_kind == "full"
    fused = eng._fused_batch(
        ["apple supply chain risk"], [("AAPL", None)]
    )
    staged = eng._embed_retrieve_batch(
        ["apple supply chain risk"], [("AAPL", None)]
    )
    assert [h["row"] for h in fused[0][1]] == [
        h["row"] for h in staged[0][1]
    ]


def test_sharded_fused_via_ask(tmp_path):
    import asyncio

    eng = _sharded_engine(tmp_path)
    resp = asyncio.run(eng.ask("microsoft cloud growth", "MSFT"))
    assert resp["sources"]
    assert all(s["document_type"] == "10-Q" for s in resp["sources"])


def test_sharded_save_load_keeps_token_store(tmp_path):
    from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
    from financial_rag_system_tpu.models.tokenizer import Tokenizer

    eng = _sharded_engine(tmp_path)
    eng.index.save(str(tmp_path))
    loaded = ShardedFlatIndex.load(
        str(tmp_path), eng.index.mesh, tokenizer=Tokenizer()
    )
    assert loaded._doc_tok is not None
    assert loaded.token_store_len == eng.index.token_store_len
    np.testing.assert_array_equal(
        np.asarray(loaded._doc_tok), np.asarray(eng.index._doc_tok)
    )


def _sharded_hash_engine(tmp_path, *, identity=False, store=True):
    from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
    from financial_rag_system_tpu.models.embedder import HashEmbedder
    from financial_rag_system_tpu.models.reranker import HashReranker
    from financial_rag_system_tpu.serving.engine import RAGEngine
    from financial_rag_system_tpu.utils.config import Config

    emb = HashEmbedder(dim=64)
    mesh = create_mesh()
    index = ShardedFlatIndex(
        mesh, 64, capacity=512, tile=64,
        token_store_len=96 if store else None,
        tokenizer=emb.tokenizer if store else None,
    )
    docs = [
        ("Apple revenue grew 8 percent on iphone demand", "AAPL"),
        ("Apple services margin expanded again this quarter", "AAPL"),
        ("Microsoft cloud revenue grew 24 percent", "MSFT"),
        ("Microsoft operating income rose on azure", "MSFT"),
        ("Apple supply chain concentration remains a risk", "AAPL"),
        ("Nvidia data center revenue tripled", "NVDA"),
    ] * 3
    vecs = emb.encode([d for d, _ in docs])
    index.upsert(
        [f"d{i}" for i in range(len(docs))], vecs,
        [f"{d} clause {i}" for i, (d, _) in enumerate(docs)],
        [
            {"ticker": t, "document_type": "10-Q", "source_file": f"f{i}"}
            for i, (_, t) in enumerate(docs)
        ],
    )
    cfg = Config(testing=True, database_url=":memory:", embed_dim=64,
                 breaker_state_path=str(tmp_path / "cbh.json"))
    return RAGEngine(
        cfg, index, emb, HashReranker(identity=identity), mode="sequential"
    ), emb


def test_sharded_hash_fused_matches_staged(tmp_path):
    """The hash stack fuses on a sharded mesh too (the multi-process
    TESTING deployment's batch path): rows/scores match the staged
    sharded scan, and the de-aliased rerank matches the host reranker."""
    eng, emb = _sharded_hash_engine(tmp_path)
    assert eng._fused_kind == "hash" and eng._fused_hash_rerank
    queries = ["apple services margin", "microsoft cloud growth"]
    filters = [("AAPL", None), (None, None)]
    fused = eng._fused_batch(queries, filters)
    assert fused is not None
    staged = eng._embed_retrieve_batch(queries, filters)
    for q, (f_vec, f_hits), (s_vec, s_hits) in zip(queries, fused, staged):
        assert [h["row"] for h in f_hits] == [h["row"] for h in s_hits]
        np.testing.assert_allclose(
            [h["score"] for h in f_hits], [h["score"] for h in s_hits],
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(f_vec, s_vec, rtol=1e-4, atol=1e-4)
        host = eng.reranker.score(q, [h["text"] for h in f_hits])
        np.testing.assert_allclose(
            [h["rerank_score"] for h in f_hits], host, rtol=1e-4, atol=1e-4
        )
    assert all(h["ticker"] == "AAPL" for h in fused[0][1])


def test_sharded_hash_fused_identity_testing_mode(tmp_path):
    """TESTING uses the identity reranker: fused still runs (ce == bi,
    order-consistent with identity) without a fused hash rerank."""
    eng, _ = _sharded_hash_engine(tmp_path, identity=True)
    assert eng._fused_kind == "hash" and not eng._fused_hash_rerank
    fused = eng._fused_batch(["apple supply chain"], [("AAPL", None)])
    assert fused is not None
    _v, hits = fused[0]
    assert hits and all("rerank_score" in h for h in hits)


def _many_docs(n=96):
    topics = ["revenue growth", "dividend payout", "cloud computing",
              "supply chain", "cyber security", "artificial intelligence"]
    tick = ["AAPL", "MSFT", "NVDA"]
    return [
        (f"filing chunk {i} discussing {topics[i % len(topics)]} details",
         tick[i % len(tick)])
        for i in range(n)
    ]


def test_sharded_ivf_engine_fused_matches_staged(tmp_path):
    from financial_rag_system_tpu.index.sharded_ivf import ShardedIVFIndex

    eng = _sharded_engine(tmp_path)
    docs = _many_docs()
    vecs = eng.embedder.encode([d for d, _ in docs])
    eng.index.upsert(
        [f"m{i}" for i in range(len(docs))], vecs, [d for d, _ in docs],
        [
            {"ticker": t, "document_type": "10-K", "source_file": f"m{i}"}
            for i, (_, t) in enumerate(docs)
        ],
    )
    out = eng.rebuild_index("ivf")
    assert out["status"] == "ok" and isinstance(eng.index, ShardedIVFIndex)
    assert eng._fused_fn is not None and eng._fused_kind == "ivf_full"

    # tiny corpora make every ticker list "selective" (exact-scored via
    # the staged path); drop the limit so the fused program itself runs
    eng.index.SELECTIVE_LIMIT = 0
    queries = ["cloud computing details", "dividend payout details"]
    filters = [("MSFT", None), (None, None)]
    fused = eng._fused_batch(queries, filters)
    assert fused is not None
    staged = eng._embed_retrieve_batch(queries, filters)
    for (_fv, f_hits), (_sv, s_hits) in zip(fused, staged):
        assert {h["row"] for h in f_hits} == {h["row"] for h in s_hits}
        assert all("rerank_score" in h for h in f_hits)
    assert all(h["ticker"] == "MSFT" for h in fused[0][1])


def test_sharded_ivf_fused_tail_falls_back(tmp_path):
    eng = _sharded_engine(tmp_path)
    docs = _many_docs()
    vecs = eng.embedder.encode([d for d, _ in docs])
    eng.index.upsert(
        [f"m{i}" for i in range(len(docs))], vecs, [d for d, _ in docs],
        [{"ticker": t, "document_type": "10-K"} for _, t in docs],
    )
    eng.rebuild_index("ivf")
    # tail row => the fused program would miss it; dispatch must fall back
    nv = eng.embedder.encode(["fresh tail chunk on buyback plans"])
    eng.index.upsert(["tail0"], nv, ["fresh tail chunk on buyback plans"],
                     [{"ticker": "AMZN", "document_type": "10-K"}])
    assert eng._fused_batch(["buyback plans"], [("AMZN", None)]) is None
    out = eng._dispatch_batch(["buyback plans"], [("AMZN", None)])
    hits = out[0][1]
    assert hits and hits[0]["ticker"] == "AMZN"


def test_sharded_hnsw_engine_fused_matches_staged(tmp_path):
    from financial_rag_system_tpu.index.sharded_hnsw import ShardedHNSWIndex

    eng = _sharded_engine(tmp_path)
    docs = _many_docs()
    vecs = eng.embedder.encode([d for d, _ in docs])
    eng.index.upsert(
        [f"m{i}" for i in range(len(docs))], vecs, [d for d, _ in docs],
        [{"ticker": t, "document_type": "10-K"} for _, t in docs],
    )
    out = eng.rebuild_index("hnsw")
    assert out["status"] == "ok" and isinstance(eng.index, ShardedHNSWIndex)
    assert eng._fused_fn is not None and eng._fused_kind == "hnsw_full"
    eng.index.SELECTIVE_LIMIT = 0
    queries = ["cloud computing details", "supply chain details"]
    filters = [("MSFT", None), (None, None)]
    fused = eng._fused_batch(queries, filters)
    assert fused is not None
    staged = eng._embed_retrieve_batch(queries, filters)
    for (_fv, f_hits), (_sv, s_hits) in zip(fused, staged):
        assert {h["row"] for h in f_hits} == {h["row"] for h in s_hits}
    assert all(h["ticker"] == "MSFT" for h in fused[0][1])


def test_sharded_ivf_fused_geometry_guard(tmp_path):
    """A repacking that races the fused program's captured tile math must
    force the staged path."""
    eng = _sharded_engine(tmp_path)
    docs = _many_docs()
    vecs = eng.embedder.encode([d for d, _ in docs])
    eng.index.upsert(
        [f"m{i}" for i in range(len(docs))], vecs, [d for d, _ in docs],
        [{"ticker": t, "document_type": "10-K"} for _, t in docs],
    )
    eng.rebuild_index("ivf")
    eng.index.SELECTIVE_LIMIT = 0
    args = (["cloud computing details"], [(None, None)])
    assert eng._fused_batch(*args) is not None
    state = eng.index._state
    geom = state[5]
    bad = (geom[0], geom[1] + 1, geom[2], geom[3])  # tiles_per_cluster drift
    eng.index._state = state[:5] + (bad,) + state[6:]
    assert eng._fused_batch(*args) is None
    eng.index._state = state
    assert eng._fused_batch(*args) is not None


def test_fused_prefix_family_matches_full():
    """Telescoping bench prefixes (ops/fused_query.fused_two_stage_prefix)
    compile the SAME pipeline serving compiles: stop='full' is
    bit-identical to fused_two_stage, and every shorter prefix agrees
    with the full program on the outputs it shares (VERDICT r4 #2 — the
    stage attribution is only meaningful if the prefixes are true
    prefixes)."""
    from financial_rag_system_tpu.ops.fused_query import make_fused_prefix

    k, tile, b, lq, dlen, d = 7, 64, 4, 16, 32, 32
    n = 4 * tile
    rng = np.random.default_rng(3)
    ep = bert.init_params(jax.random.PRNGKey(0), TINY_EMBED)
    rp = bert.init_params(jax.random.PRNGKey(1), TINY_CROSS)
    q_ids = jnp.asarray(rng.integers(103, 2000, (b, lq)), jnp.int32)
    q_types = jnp.zeros_like(q_ids)
    q_mask = jnp.ones_like(q_ids)
    qf = jnp.asarray(
        np.stack([rng.integers(0, 3, b), np.full(b, -1)], axis=1), jnp.int32
    )
    emb = rng.standard_normal((n, d)).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    args = (
        ep, rp, q_ids, q_types, q_mask, qf, jnp.asarray(emb),
        jnp.asarray(np.stack([rng.integers(0, 3, n), rng.integers(0, 2, n)]),
                    jnp.int32),
        jnp.asarray(rng.integers(103, 2000, (n, dlen)), jnp.int32),
        jnp.asarray(n - 5, jnp.int32),
    )

    def mk(stop):
        return make_fused_prefix(
            TINY_EMBED, TINY_CROSS, k=k, tile=tile, use_pallas=False,
            stop=stop,
        )

    rows_f, bi_f, ce_f = mk("full")(*args)
    ref = fused_two_stage(
        *args, embed_cfg=TINY_EMBED, rerank_cfg=TINY_CROSS,
        k=k, tile=tile, use_pallas=False,
    )
    # same math, different jit fusion boundaries: scores agree to float
    # rounding, candidate sets exactly
    np.testing.assert_array_equal(np.asarray(rows_f), np.asarray(ref[0]))
    np.testing.assert_allclose(
        np.asarray(bi_f), np.asarray(ref[1]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(ce_f), np.asarray(ref[2]), rtol=1e-5, atol=1e-6
    )

    qv = mk("embed")(*args)
    assert qv.shape == (b, d)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(qv, axis=-1)), 1.0, rtol=1e-5
    )
    rows_s, bi_s = mk("search")(*args)
    np.testing.assert_array_equal(np.asarray(rows_s), np.asarray(rows_f))
    np.testing.assert_allclose(
        np.asarray(bi_s), np.asarray(bi_f), rtol=1e-5, atol=1e-6
    )
    rows_g, chk = mk("gather")(*args)
    np.testing.assert_array_equal(np.asarray(rows_g), np.asarray(rows_f))
    assert chk.shape == (b,) and bool(np.all(np.asarray(chk) > 0))
    rows_l, cls_sum = mk("layers")(*args)
    np.testing.assert_array_equal(np.asarray(rows_l), np.asarray(rows_f))
    assert cls_sum.shape == (b, k)
    assert bool(np.all(np.isfinite(np.asarray(cls_sum))))
