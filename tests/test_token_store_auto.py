"""Auto-sized device token store (VERDICT r4 #1).

token_store_len="auto" sizes the store at ingest from the measured p99
wordpiece length (the policy bench.py applied by hand) instead of a
static width that silently truncates realistic 1000-char chunks, and
widens — rebuilding every stored row — when later ingests measure
longer.  The fused serving program gates on token_store_enabled and
falls back staged until the store materializes.
"""

import numpy as np
import pytest

import jax

from financial_rag_system_tpu.index.flat import FlatIndex, auto_token_width
from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.embedder import BiEncoder
from financial_rag_system_tpu.models.reranker import CrossEncoderReranker
from financial_rag_system_tpu.models.tokenizer import SEP_ID, Tokenizer
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


def _docs(n, words):
    return [
        f"note {i} alpha beta " + " ".join(f"tok{j}" for j in range(words))
        for i in range(n)
    ]


def _payloads(n, ticker="AAPL"):
    return [
        {"ticker": ticker, "document_type": "10-K", "source_file": f"f{i}"}
        for i in range(n)
    ]


def test_auto_token_width_policy():
    assert auto_token_width([]) == 16
    # a 1% outlier is excluded by design; a 10% tail is covered
    assert auto_token_width([70] * 99 + [500], cap=384) < 120
    assert auto_token_width([70] * 90 + [200] * 10, cap=384) == 200
    assert auto_token_width([999] * 10, cap=384) == 384  # capped
    assert auto_token_width([3, 4], cap=384) == 16  # floor


def test_flat_auto_materializes_at_measured_width():
    tok = Tokenizer()
    idx = FlatIndex(
        8, capacity=128, tile=128, use_pallas=False,
        token_store_len="auto", tokenizer=tok,
    )
    assert idx.token_store_enabled and idx._doc_tok is None
    texts = _docs(16, words=12)
    vecs = np.random.default_rng(0).standard_normal((16, 8))
    idx.upsert([f"d{i}" for i in range(16)], vecs, texts, _payloads(16))
    assert idx._doc_tok is not None
    lens = [len(tok.tokenize_ids(t)) + 1 for t in texts]
    assert idx.token_store_len == auto_token_width(lens)
    # rows carry the tokens + SEP
    row = np.asarray(idx._doc_tok[0])
    tids = tok.tokenize_ids(texts[0])
    assert list(row[: len(tids)]) == tids
    assert row[len(tids)] == SEP_ID


def test_flat_auto_widens_and_rebuilds_old_rows():
    tok = Tokenizer()
    idx = FlatIndex(
        8, capacity=256, tile=128, use_pallas=False,
        token_store_len="auto", tokenizer=tok,
    )
    rng = np.random.default_rng(1)
    short = _docs(8, words=10)
    idx.upsert([f"s{i}" for i in range(8)], rng.standard_normal((8, 8)),
               short, _payloads(8))
    w0 = idx.token_store_len
    long = _docs(8, words=120)
    idx.upsert([f"l{i}" for i in range(8)], rng.standard_normal((8, 8)),
               long, _payloads(8))
    w1 = idx.token_store_len
    assert w1 > w0 and w1 % 32 == 0
    # the widened store re-tokenized EVERY row at the new width: early
    # short rows keep full tokens+SEP, long rows fill to the new width
    dtok = np.asarray(idx._doc_tok)
    assert dtok.shape[1] == w1
    tids = tok.tokenize_ids(short[3])
    assert list(dtok[3, : len(tids)]) == tids and dtok[3, len(tids)] == SEP_ID
    ltids = tok.tokenize_ids(long[0])[: w1 - 1] + [SEP_ID]
    assert list(dtok[8, : len(ltids)]) == ltids


def test_flat_auto_save_load_keeps_width(tmp_path):
    tok = Tokenizer()
    idx = FlatIndex(
        8, capacity=128, tile=128, use_pallas=False,
        token_store_len="auto", tokenizer=tok,
    )
    idx.upsert(["a"], np.ones((1, 8)), ["hello world text"], _payloads(1))
    w = idx.token_store_len
    idx.save(str(tmp_path))
    loaded = FlatIndex.load(str(tmp_path), use_pallas=False, tokenizer=tok)
    assert loaded.token_store_len == w
    np.testing.assert_array_equal(
        np.asarray(loaded._doc_tok[0]), np.asarray(idx._doc_tok[0])
    )


def test_engine_fuses_before_store_materializes(tmp_path):
    """The fused program builds against an EMPTY auto-store index
    (serving starts before ingest); batches fall back staged until the
    first ingest materializes the store, then fuse."""
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
        token_store_len="auto", tokenizer=tok,
    )
    cfg = Config(
        testing=True, database_url=":memory:",
        breaker_state_path=str(tmp_path / "cb.json"), embed_dim=64,
    )
    eng = RAGEngine(cfg, index, embedder, reranker, mode="sequential")
    assert eng._fused_fn is not None and eng._fused_kind == "full"
    # empty store: fused path declines, staged fallback serves
    assert eng._fused_batch(["apple margin"], [("AAPL", None)]) is None
    texts = [
        "Apple reported strong quarterly results across hardware",
        "Apple margin expanded on cost discipline this period",
        "Microsoft cloud momentum continued in the quarter",
    ]
    vecs = embedder.encode(texts)
    index.upsert(
        ["d0", "d1", "d2"], vecs, texts,
        _payloads(2) + _payloads(1, "MSFT"),
    )
    fused = eng._fused_batch(["apple margin"], [("AAPL", None)])
    assert fused is not None
    staged = eng._embed_retrieve_batch(["apple margin"], [("AAPL", None)])
    assert [h["row"] for h in fused[0][1]] == [
        h["row"] for h in staged[0][1]
    ]
    assert all("rerank_score" in h for h in fused[0][1])


def test_sharded_auto_matches_flat():
    from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
    from financial_rag_system_tpu.parallel.mesh import create_mesh

    tok = Tokenizer()
    mesh = create_mesh()
    sh = ShardedFlatIndex(
        mesh, 8, capacity=1024, tile=128, use_pallas=False,
        token_store_len="auto", tokenizer=tok,
    )
    fl = FlatIndex(
        8, capacity=1024, tile=128, use_pallas=False,
        token_store_len="auto", tokenizer=tok,
    )
    rng = np.random.default_rng(2)
    for batch_words in (8, 100):
        texts = _docs(16, words=batch_words)
        vecs = rng.standard_normal((16, 8))
        ids = [f"{batch_words}_{i}" for i in range(16)]
        sh.upsert(ids, vecs, texts, _payloads(16))
        fl.upsert(ids, vecs, texts, _payloads(16))
        assert sh.token_store_len == fl.token_store_len
    np.testing.assert_array_equal(
        np.asarray(sh._doc_tok[: sh.n_valid]),
        np.asarray(fl._doc_tok[: fl.n_valid]),
    )


def test_fused_matches_staged_at_realistic_chunks(tmp_path):
    """Fused-vs-staged agreement at reference-realistic 1000-char chunks
    (VERDICT r4 #1's agreement check): with the auto-sized token store,
    the fused program's candidate sets and rerank ordering match the
    staged harness on a realistic corpus — token-store sizing costs no
    recall.  (Reference main.py:241-247 reranks full chunk text; here
    the device store must cover it.)"""
    from financial_rag_system_tpu.data.synthetic import make_hard_corpus

    tok = Tokenizer()
    ids, texts, payloads = make_hard_corpus(96, chunk_chars=1000)
    assert int(np.percentile([len(t) for t in texts], 50)) > 700

    embedder = BiEncoder(
        bert.init_params(jax.random.PRNGKey(0), TINY_EMBED),
        TINY_EMBED, tok, pooling="cls", max_len=64,
    )
    reranker = CrossEncoderReranker(
        bert.init_params(jax.random.PRNGKey(1), TINY_CROSS),
        TINY_CROSS, tok, max_len=512,
    )
    index = FlatIndex(
        64, capacity=128, tile=128, use_pallas=False,
        token_store_len="auto", tokenizer=tok,
    )
    index.upsert(ids, embedder.encode(texts), texts, payloads)
    # the measured store must cover realistic chunks (not the legacy 80)
    assert index.token_store_len >= 224

    cfg = Config(
        testing=True, database_url=":memory:",
        breaker_state_path=str(tmp_path / "cb.json"), embed_dim=64,
    )
    eng = RAGEngine(cfg, index, embedder, reranker, mode="sequential")
    assert eng._fused_fn is not None and eng._fused_kind == "full"

    # a second engine over the SAME corpus with a full-width store
    # (448: covers every chunk's wordpieces outright, and 32 + 448 still
    # fits TINY_CROSS's 512 positions):
    # no chunk can truncate there, so any auto-width cost shows as a
    # fused-vs-fused divergence (same pair layout in both — this isolates
    # truncation from the documented fixed-offset layout approximation,
    # ops/fused_query.py module docstring)
    index_full = FlatIndex(
        64, capacity=128, tile=128, use_pallas=False,
        token_store_len=448, tokenizer=tok,
    )
    index_full.upsert(
        ids, embedder.encode(texts), texts, payloads
    )
    eng_full = RAGEngine(
        cfg, index_full, embedder, reranker, mode="sequential"
    )

    queries = [
        "how did revenue trend this quarter",
        "what pressured gross margin",
    ]
    filters = [("AAPL", None), ("AAPL", None)]
    fused = eng._fused_batch(queries, filters)
    fused_full = eng_full._fused_batch(queries, filters)
    assert fused is not None and fused_full is not None
    staged = eng._embed_retrieve_batch(queries, filters)
    for ((_fv, fh), (_gv, gh), (_sv, sh)) in zip(fused, fused_full, staged):
        # identical retrieval candidate sets: fused == staged
        assert [h["row"] for h in fh] == [h["row"] for h in sh]
        assert [h["row"] for h in gh] == [h["row"] for h in sh]
        # identical rerank ORDERING auto-width vs untruncated: the
        # p99-sized store loses no recall
        auto_order = [
            h["row"] for h in sorted(fh, key=lambda h: -h["rerank_score"])
        ]
        full_order = [
            h["row"] for h in sorted(gh, key=lambda h: -h["rerank_score"])
        ]
        assert auto_order == full_order
        # and for every candidate the store fully covers, the device
        # score is bit-identical to the untruncated store's
        w = index.token_store_len
        for hf, hg in zip(fh, gh):
            if len(tok.tokenize_ids(hf["text"])) + 1 <= w:
                assert hf["rerank_score"] == hg["rerank_score"]
