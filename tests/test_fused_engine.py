"""Fused single-program serving path: engine auto-fuses with the full
model stack + device token store, and results match the staged path."""

import asyncio

import numpy as np
import pytest

import jax

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.embedder import BiEncoder
from financial_rag_system_tpu.models.reranker import CrossEncoderReranker
from financial_rag_system_tpu.models.tokenizer import Tokenizer
from financial_rag_system_tpu.serving.engine import RAGEngine
from financial_rag_system_tpu.utils.config import Config

TINY_EMBED = bert.BertConfig(
    vocab_size=30522, hidden=64, layers=2, heads=4, intermediate=128,
    max_positions=128, with_pooler=True,
)
TINY_CROSS = bert.BertConfig(
    vocab_size=30522, hidden=64, layers=2, heads=4, intermediate=128,
    max_positions=512, with_pooler=True, num_labels=1,
)

DOCS = [
    ("Apple reported revenue of 89.5 billion dollars for the quarter", "AAPL"),
    ("Apple gross margin expanded to 45.2 percent on services strength", "AAPL"),
    ("Apple supply chain risk is concentrated in asia manufacturing", "AAPL"),
    ("Microsoft cloud revenue grew 24 percent year over year", "MSFT"),
    ("Microsoft operating income increased on azure growth", "MSFT"),
    ("Apple research and development expense increased 14 percent", "AAPL"),
]


@pytest.fixture(scope="module")
def stack():
    tok = Tokenizer()
    embedder = BiEncoder(
        bert.init_params(jax.random.PRNGKey(0), TINY_EMBED),
        TINY_EMBED, tok, pooling="cls", max_len=64,
    )
    reranker = CrossEncoderReranker(
        bert.init_params(jax.random.PRNGKey(1), TINY_CROSS),
        TINY_CROSS, tok, max_len=160,
    )
    index = FlatIndex(
        64, capacity=128, tile=128, use_pallas=False,
        token_store_len=96, tokenizer=tok,
    )
    vecs = embedder.encode([d for d, _ in DOCS])
    index.upsert(
        [f"d{i}" for i in range(len(DOCS))], vecs, [d for d, _ in DOCS],
        [
            {"ticker": t, "document_type": "10-Q", "source_file": f"f{i}"}
            for i, (_, t) in enumerate(DOCS)
        ],
    )
    return embedder, reranker, index


def _engine(tmp_path, stack, **kw):
    embedder, reranker, index = stack
    cfg = Config(
        testing=True, database_url=":memory:", batch_window_s=0.01,
        breaker_state_path=str(tmp_path / "cb.json"), embed_dim=64,
    )
    return RAGEngine(cfg, index, embedder, reranker, **kw)


def test_engine_detects_fused(tmp_path, stack):
    eng = _engine(tmp_path, stack, mode="sequential")
    assert eng._fused_fn is not None


def test_fused_matches_staged(tmp_path, stack):
    embedder, reranker, index = stack
    eng = _engine(tmp_path, stack, mode="sequential")
    queries = ["apple services margin", "microsoft cloud growth"]
    filters = [("AAPL", None), ("MSFT", None)]

    fused = eng._fused_retrieve_batch(
        queries, filters, eng._fused_fn, eng._fused_kind, eng.index
    )
    staged = eng._embed_retrieve_batch(queries, filters)
    for (_f_vec, f_hits), (_s_vec, s_hits) in zip(fused, staged):
        assert [h["row"] for h in f_hits] == [h["row"] for h in s_hits]
        # fused ce scores ~= host-staged reranker scores
        for fh in f_hits:
            assert "rerank_score" in fh

    # exact check of the device gather+concat: rebuild the pair batch on
    # host from the same token store rows and run the same cross head
    import jax.numpy as jnp

    from financial_rag_system_tpu.models.tokenizer import pad_batch

    tok = embedder.tokenizer
    encs = [tok.encode(q, 64) for q in queries]
    qi, qt, qm = pad_batch(encs)
    lq = qi.shape[1]
    dtok = np.asarray(index._doc_tok)
    rows0 = [h["row"] for h in fused[0][1]]
    pair_ids = np.concatenate(
        [np.tile(qi[0], (len(rows0), 1)), dtok[rows0]], axis=1
    )
    pair_types = np.concatenate(
        [np.zeros((len(rows0), lq), np.int32),
         np.ones((len(rows0), dtok.shape[1]), np.int32)], axis=1,
    )
    pair_mask = (pair_ids != 0).astype(np.int32)
    host_logits = np.asarray(
        bert.cross_score(
            reranker.params, jnp.asarray(pair_ids), jnp.asarray(pair_types),
            jnp.asarray(pair_mask), reranker.cfg,
        )
    )
    fused_scores = np.asarray([h["rerank_score"] for h in fused[0][1]])
    np.testing.assert_allclose(fused_scores, host_logits, rtol=2e-3, atol=2e-3)


def test_fused_ask_end_to_end(tmp_path, stack):
    eng = _engine(tmp_path, stack, mode="batched")

    async def t():
        await eng.startup()
        try:
            r = await eng.ask("apple supply chain risk", "AAPL", top_k=2)
            assert r["cached"] is False
            assert len(r["sources"]) == 2
            assert r["sources"][0]["score"] >= r["sources"][1]["score"]
            tr = eng.tracer.recent_traces(10)
            rerank_spans = [s for s in tr if s["name"] == "3_Reranking"]
            assert rerank_spans and rerank_spans[-1]["attrs"].get("fused")
        finally:
            await eng.shutdown()

    asyncio.run(t())


def test_hash_fused_matches_staged(tmp_path):
    from financial_rag_system_tpu.models.embedder import HashEmbedder
    from financial_rag_system_tpu.models.reranker import HashReranker

    emb = HashEmbedder(dim=64)
    index = FlatIndex(64, capacity=128, tile=128, use_pallas=False)
    texts = [d for d, _ in DOCS]
    index.upsert(
        [f"d{i}" for i in range(len(DOCS))], emb.encode(texts), texts,
        [
            {"ticker": t, "document_type": "10-Q", "source_file": f"f{i}"}
            for i, (_, t) in enumerate(DOCS)
        ],
    )
    cfg = Config(testing=True, database_url=":memory:", embed_dim=64,
                 breaker_state_path=str(tmp_path / "cb.json"))
    eng = RAGEngine(cfg, index, emb, HashReranker(), mode="sequential")
    assert eng._fused_kind == "hash"

    queries = ["apple services margin", "microsoft cloud growth"]
    filters = [("AAPL", None), ("MSFT", None)]
    fused = eng._fused_retrieve_batch(
        queries, filters, eng._fused_fn, eng._fused_kind, eng.index
    )
    staged = eng._embed_retrieve_batch(queries, filters)
    for (f_vec, f_hits), (s_vec, s_hits) in zip(fused, staged):
        assert [h["row"] for h in f_hits] == [h["row"] for h in s_hits]
        np.testing.assert_allclose(
            [h["score"] for h in f_hits], [h["score"] for h in s_hits],
            rtol=2e-3, atol=2e-3,
        )
        np.testing.assert_allclose(f_vec, s_vec, rtol=1e-4, atol=1e-4)
