"""Concurrency stress: searches keep serving during upserts and rebuilds.

The reference relies on "safety by construction" (single event loop +
thread offload, SURVEY.md §5.2).  This framework additionally mutates
index state from worker threads (POST /index/upsert, /index/rebuild run
in asyncio.to_thread), so the tier-swap paths must stay safe under real
thread interleaving: searches read one consistent graph/packing snapshot
while a rebuild replaces it.
"""

import threading

import numpy as np
import pytest

from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.index.hnsw import HNSWIndex
from financial_rag_system_tpu.index.ivf import IVFIndex


def _mk(n=512, d=64, seed=0):
    rng = np.random.default_rng(seed)
    v = rng.standard_normal((n, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    flat = FlatIndex(dim=d, capacity=4 * n, tile=128, use_pallas=False)
    flat.upsert(
        [f"p{i}" for i in range(n)], v, [f"text {i}" for i in range(n)],
        [{"ticker": ["AAPL", "MSFT"][i % 2], "document_type": "10-K"}
         for i in range(n)],
    )
    return flat, rng


@pytest.mark.slow
@pytest.mark.parametrize("tier", ["hnsw", "ivf"])
def test_search_serves_through_rebuild_and_upserts(tier):
    flat, rng = _mk()
    idx = (
        HNSWIndex(flat, m=8, ef=64, frontier=4)
        if tier == "hnsw"
        else IVFIndex(flat, tile=128)
    )
    q = rng.standard_normal((4, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)

    errors: list[BaseException] = []
    stop = threading.Event()

    def searcher():
        while not stop.is_set():
            try:
                hits = idx.search_batch(q, [(None, None)] * 4, k=5)
                assert len(hits) == 4
                for hl in hits:
                    rows = [h["row"] for h in hl]
                    assert len(rows) == len(set(rows))  # no dup rows
            except BaseException as exc:  # pragma: no cover — fail below
                errors.append(exc)
                return

    def mutator():
        try:
            for i in range(6):
                nv = rng.standard_normal((8, 64)).astype(np.float32)
                nv /= np.linalg.norm(nv, axis=1, keepdims=True)
                idx.upsert(
                    [f"x{i}_{j}" for j in range(8)], nv,
                    [f"new {i} {j}" for j in range(8)],
                    [{"ticker": "NVDA", "document_type": "10-Q"}] * 8,
                )
                idx.rebuild()
        except BaseException as exc:  # pragma: no cover
            errors.append(exc)

    searchers = [threading.Thread(target=searcher) for _ in range(3)]
    mut = threading.Thread(target=mutator)
    for t in searchers:
        t.start()
    mut.start()
    mut.join(timeout=300)
    stop.set()
    for t in searchers:
        t.join(timeout=60)
    assert not errors, errors[:1]
    # all upserted rows folded in by the final rebuild
    assert idx.n_valid == 512 + 6 * 8
    hits = idx.search_batch(q, [("NVDA", None)] * 4, k=5)
    assert all(h["ticker"] == "NVDA" for hl in hits for h in hl)


@pytest.mark.slow
def test_fused_dispatch_serves_through_tier_swaps(tmp_path):
    """The engine's fused dispatch must survive concurrent tier
    promotions: the (fused_fn, kind, index) capture plus the geometry
    guards mean a racing rebuild degrades to the staged path, never a
    crash or mismatched walk."""
    import jax

    from financial_rag_system_tpu.models import bert
    from financial_rag_system_tpu.models.embedder import BiEncoder
    from financial_rag_system_tpu.models.reranker import CrossEncoderReranker
    from financial_rag_system_tpu.models.tokenizer import Tokenizer
    from financial_rag_system_tpu.serving.engine import RAGEngine
    from financial_rag_system_tpu.utils.config import Config

    tiny_e = bert.BertConfig(
        vocab_size=2048, hidden=32, layers=1, heads=2, intermediate=64,
        max_positions=64, with_pooler=True,
    )
    tiny_c = bert.BertConfig(
        vocab_size=2048, hidden=32, layers=1, heads=2, intermediate=64,
        max_positions=128, with_pooler=True, num_labels=1,
    )
    tok = Tokenizer()
    embedder = BiEncoder(
        bert.init_params(jax.random.PRNGKey(0), tiny_e), tiny_e, tok,
        pooling="cls", max_len=64,
    )
    reranker = CrossEncoderReranker(
        bert.init_params(jax.random.PRNGKey(1), tiny_c), tiny_c, tok,
        max_len=160,
    )
    flat = FlatIndex(32, capacity=512, tile=64, use_pallas=False,
                     token_store_len=64, tokenizer=tok)
    texts = [f"chunk {i} about topic {i % 7}" for i in range(64)]
    vecs = embedder.encode(texts)
    flat.upsert(
        [f"p{i}" for i in range(64)], vecs, texts,
        [{"ticker": ["AAPL", "MSFT"][i % 2], "document_type": "10-K"}
         for i in range(64)],
    )
    cfg = Config(testing=True, database_url=":memory:",
                 breaker_state_path=str(tmp_path / "cb.json"), embed_dim=32)
    eng = RAGEngine(cfg, flat, embedder, reranker, mode="sequential")

    stop = threading.Event()
    errors: list[BaseException] = []

    def searcher():
        while not stop.is_set():
            try:
                out = eng._dispatch_batch(
                    ["topic 3 details", "topic 5 details"],
                    [("AAPL", None), (None, None)],
                )
                assert len(out) == 2
                for _v, hits in out:
                    for h in hits:
                        assert 0 <= h["row"] < eng.index.n_valid
            except BaseException as exc:  # pragma: no cover
                errors.append(exc)
                return

    def promoter():
        tiers = ["hnsw", "ivf", "hnsw", "ivf"]
        for i, t in enumerate(tiers):
            try:
                eng.rebuild_index(t)
                nv = embedder.encode([f"new doc {i}"])
                eng.index.upsert([f"n{i}"], nv, [f"new doc {i}"],
                                 [{"ticker": "NVDA"}])
            except BaseException as exc:  # pragma: no cover
                errors.append(exc)
                return
        stop.set()

    threads = [threading.Thread(target=searcher) for _ in range(2)]
    threads.append(threading.Thread(target=promoter))
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=240)
    stop.set()
    assert not errors, errors[0]
