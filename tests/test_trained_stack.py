"""Trained-model stack: cross-encoder trainer, HF-format export, and the
serve-through-env path (RAG_TPU_BGE_DIR / RAG_TPU_RERANKER_DIR)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.tokenizer import Tokenizer, pad_batch

TINY = bert.BertConfig(
    vocab_size=512, hidden=32, layers=2, heads=2, intermediate=64,
    max_positions=64, with_pooler=True,
)
TINY_CROSS = bert.BertConfig(
    vocab_size=512, hidden=32, layers=2, heads=2, intermediate=64,
    max_positions=64, with_pooler=True, num_labels=1,
)


def _allclose_tree(a, b):
    flat_a = jax.tree_util.tree_leaves(a)
    flat_b = jax.tree_util.tree_leaves(b)
    assert len(flat_a) == len(flat_b)
    for x, y in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-6, atol=1e-6
        )


def test_hf_export_roundtrip_encoder(tmp_path):
    from financial_rag_system_tpu.models.hf_export import save_bert_checkpoint
    from financial_rag_system_tpu.models.hf_loader import load_bert_checkpoint

    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    save_bert_checkpoint(params, TINY, str(tmp_path / "enc"))
    loaded, cfg = load_bert_checkpoint(str(tmp_path / "enc"), with_pooler=True)
    assert cfg.layers == TINY.layers and cfg.hidden == TINY.hidden
    _allclose_tree(params, loaded)


def test_hf_export_roundtrip_cross_encoder(tmp_path):
    from financial_rag_system_tpu.models.hf_export import save_bert_checkpoint
    from financial_rag_system_tpu.models.hf_loader import load_bert_checkpoint

    params = bert.init_params(jax.random.PRNGKey(1), TINY_CROSS)
    save_bert_checkpoint(
        params, TINY_CROSS, str(tmp_path / "cross"), cross_encoder=True
    )
    loaded, cfg = load_bert_checkpoint(
        str(tmp_path / "cross"), with_pooler=True, num_labels=1
    )
    _allclose_tree(params, loaded)
    # scores identical through the loaded tree
    ids = jnp.asarray(np.array([[101, 7, 9, 102, 11, 102]], np.int32))
    types = jnp.asarray(np.array([[0, 0, 0, 0, 1, 1]], np.int32))
    mask = jnp.ones_like(ids)
    s0 = bert.cross_score(params, ids, types, mask, TINY_CROSS)
    s1 = bert.cross_score(loaded, ids, types, mask, cfg)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)


def test_cross_encoder_trainer_learns_bait_discrimination():
    from financial_rag_system_tpu.train.cross_encoder import (
        make_cross_examples,
        train_cross_encoder,
    )

    examples = make_cross_examples(tickers=["AAPL"], seed=0)
    assert any(lbl == 1.0 for _, _, lbl in examples)
    assert any(lbl == 0.0 for _, _, lbl in examples)
    cfg = bert.BertConfig(
        vocab_size=30522, hidden=64, layers=2, heads=2, intermediate=128,
        max_positions=256, with_pooler=True, num_labels=1,
    )
    params = bert.init_params(jax.random.PRNGKey(2), cfg)
    params, losses = train_cross_encoder(
        params, cfg, examples, epochs=12, batch_size=32, lr=1e-3, seed=0,
    )
    assert losses[-1] < losses[0]  # it learns
    # a TRAINING query must now rank its positive above its baits
    tok = Tokenizer()
    q, pos, _ = next(e for e in examples if e[2] == 1.0)
    baits = [d for qq, d, lbl in examples if qq == q and lbl == 0.0][:3]
    encs = [tok.encode_pair(q, d, 128) for d in [pos, *baits]]
    ids, types, mask = pad_batch(encs)
    scores = np.asarray(
        bert.cross_score(
            params, jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask),
            cfg,
        )
    )[: 1 + len(baits)]
    assert scores[0] > max(scores[1:]), scores


def test_exported_stack_serves_via_env(tmp_path, monkeypatch):
    from financial_rag_system_tpu.models.embedder import BiEncoder, get_embedder
    from financial_rag_system_tpu.models.hf_export import save_bert_checkpoint
    from financial_rag_system_tpu.models.reranker import (
        CrossEncoderReranker,
        get_reranker,
    )

    tok = Tokenizer()
    cfg_e = bert.BertConfig(
        vocab_size=30522, hidden=32, layers=2, heads=2, intermediate=64,
        max_positions=128, with_pooler=True,
    )
    cfg_r = bert.BertConfig(
        vocab_size=30522, hidden=32, layers=2, heads=2, intermediate=64,
        max_positions=128, with_pooler=True, num_labels=1,
    )
    enc_params = bert.init_params(jax.random.PRNGKey(3), cfg_e)
    rr_params = bert.init_params(jax.random.PRNGKey(4), cfg_r)
    save_bert_checkpoint(enc_params, cfg_e, str(tmp_path / "bge"))
    save_bert_checkpoint(
        rr_params, cfg_r, str(tmp_path / "rr"), cross_encoder=True
    )
    monkeypatch.setenv("RAG_TPU_BGE_DIR", str(tmp_path / "bge"))
    monkeypatch.setenv("RAG_TPU_RERANKER_DIR", str(tmp_path / "rr"))

    emb = get_embedder()
    rr = get_reranker()
    assert isinstance(emb, BiEncoder) and isinstance(rr, CrossEncoderReranker)
    assert rr.cfg.layers == 2  # layer count from config.json, not forced

    # served embeddings == in-memory embeddings (same hash-vocab fallback)
    ref = BiEncoder(enc_params, cfg_e, tok, pooling="cls", max_len=64)
    texts = ["apple revenue grew", "microsoft cloud margin"]
    np.testing.assert_allclose(
        emb.encode(texts), ref.encode(texts), rtol=1e-4, atol=1e-5
    )
    scores = rr.score("apple revenue", texts)
    assert scores.shape == (2,)
