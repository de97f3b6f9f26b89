"""Tokenizer, BERT forward, embedder/reranker behavior + torch parity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.embedder import HashEmbedder
from financial_rag_system_tpu.models.reranker import HashReranker, rerank
from financial_rag_system_tpu.models.tokenizer import (
    CLS_ID,
    SEP_ID,
    Tokenizer,
    pad_batch,
)

TINY = bert.BertConfig(
    vocab_size=512, hidden=64, layers=2, heads=4, intermediate=128,
    max_positions=64, with_pooler=True, num_labels=1,
)


def test_tokenizer_deterministic():
    t = Tokenizer()
    a = t.encode("Apple reported record revenue in Q4 2023.")
    b = t.encode("Apple reported record revenue in Q4 2023.")
    assert a.input_ids == b.input_ids
    assert a.input_ids[0] == CLS_ID and a.input_ids[-1] == SEP_ID


def test_tokenizer_pair_types():
    t = Tokenizer()
    e = t.encode_pair("what is revenue", "revenue was $1b", max_len=64)
    assert e.input_ids[0] == CLS_ID
    assert e.input_ids.count(SEP_ID) == 2
    first_sep = e.input_ids.index(SEP_ID)
    assert all(x == 0 for x in e.token_type_ids[: first_sep + 1])
    assert all(x == 1 for x in e.token_type_ids[first_sep + 1 :])


def test_pair_truncation():
    t = Tokenizer()
    e = t.encode_pair("short q", "word " * 500, max_len=128)
    assert len(e.input_ids) <= 128


def test_pad_batch_buckets():
    t = Tokenizer()
    encs = [t.encode("hello world"), t.encode("a much longer sentence " * 3)]
    ids, types, mask = pad_batch(encs)
    assert ids.shape[0] == 2 and ids.shape[1] in (32, 64, 128, 256, 512)
    assert mask[0].sum() == len(encs[0].input_ids)


def test_bert_forward_mask_invariance():
    """Padding tokens must not affect real-token outputs."""
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    ids = jnp.array([[101, 5, 6, 7, 102, 0, 0, 0]], jnp.int32)
    types = jnp.zeros_like(ids)
    mask = jnp.array([[1, 1, 1, 1, 1, 0, 0, 0]], jnp.int32)
    h1 = bert.encode(params, ids, types, mask, TINY)
    ids2 = ids.at[0, 5:].set(99)  # garbage in padding
    h2 = bert.encode(params, ids2, types, mask, TINY)
    np.testing.assert_allclose(
        np.asarray(h1[0, :5]), np.asarray(h2[0, :5]), rtol=1e-4, atol=1e-4
    )


def test_bf16_activation_mode_close_to_f32(monkeypatch):
    """RAG_TPU_BF16_ACT=1 must give the same encoder outputs within bf16
    rounding — guards the cast plumbing that the TPU serving path uses by
    default (bert._act_dtype)."""
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    rng = np.random.default_rng(5)
    ids = jnp.asarray(rng.integers(3, 500, (4, 16)), jnp.int32)
    types = jnp.zeros_like(ids)
    mask = jnp.ones_like(ids)

    def fresh(flag):
        monkeypatch.setenv("RAG_TPU_BF16_ACT", flag)
        # env gate is read at trace time; bypass jit caches with a fresh jit
        fn = jax.jit(lambda p, i, t, m: bert.encode(p, i, t, m, TINY))
        return np.asarray(fn(params, ids, types, mask))

    h32 = fresh("0")
    h16 = fresh("1")
    assert h16.dtype == np.float32  # encode always returns f32
    scale = float(np.std(h32))
    assert np.max(np.abs(h32 - h16)) < 0.05 * max(scale, 1.0)
    # and the flag actually changes the program (bf16 rounding is visible)
    assert not np.array_equal(h32, h16)


def test_int8_ptq_preserves_ordering():
    """bert.quantize_params: the int8 forward must keep the f32 forward's
    pair ORDERING — that is the only thing the rerank stage consumes
    (reference selection rule main.py:241-247)."""
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    qparams = bert.quantize_params(params)
    # six weight stacks went int8 with per-channel scales alongside
    assert qparams["layers"]["q_w"].dtype == jnp.int8
    assert qparams["layers"]["in_w__scale"].shape == (
        TINY.layers, 1, TINY.intermediate
    )
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(3, 500, (16, 24)), jnp.int32)
    types = jnp.zeros_like(ids)
    mask = jnp.ones_like(ids)
    s32 = np.asarray(bert.cross_score(params, ids, types, mask, TINY))
    s8 = np.asarray(bert.cross_score(qparams, ids, types, mask, TINY))
    r32 = np.argsort(np.argsort(-s32))
    r8 = np.argsort(np.argsort(-s8))
    rho = float(np.corrcoef(r32, r8)[0, 1])
    assert rho > 0.95, f"int8 PTQ broke rerank ordering (rho={rho})"
    assert np.max(np.abs(s32 - s8)) < 0.2 * max(1.0, float(np.std(s32)))


def test_int8_rerank_env_gate(monkeypatch):
    """RAG_TPU_INT8_RERANK=1 quantizes CrossEncoderReranker.params at
    construction, so both the staged and fused paths serve int8."""
    from financial_rag_system_tpu.models.reranker import CrossEncoderReranker

    params = bert.init_params(jax.random.PRNGKey(1), TINY)
    monkeypatch.setenv("RAG_TPU_INT8_RERANK", "1")
    rr = CrossEncoderReranker(params, TINY, Tokenizer())
    assert rr.params["layers"]["out_w"].dtype == jnp.int8
    scores = rr.score("what is revenue", ["revenue was $1b", "the sky is blue"])
    assert scores.shape == (2,) and np.all(np.isfinite(scores))
    monkeypatch.setenv("RAG_TPU_INT8_RERANK", "0")
    rr2 = CrossEncoderReranker(params, TINY, Tokenizer())
    assert rr2.params["layers"]["out_w"].dtype != jnp.int8


def test_embed_cls_normalized():
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    ids = jnp.array([[101, 5, 6, 102], [101, 9, 10, 102]], jnp.int32)
    v = bert.embed_cls(params, ids, jnp.zeros_like(ids), jnp.ones_like(ids), TINY)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0, rtol=1e-5)


def test_cross_score_shape():
    params = bert.init_params(jax.random.PRNGKey(0), TINY)
    ids = jnp.array([[101, 5, 102, 6, 102]], jnp.int32)
    s = bert.cross_score(
        params, ids, jnp.zeros_like(ids), jnp.ones_like(ids), TINY
    )
    assert s.shape == (1,)


def test_hash_embedder_lexical():
    e = HashEmbedder(dim=128)
    v = e.encode(
        [
            "apple revenue grew in the december quarter",
            "apple revenue increased in the december quarter",
            "entirely unrelated text about weather patterns",
        ]
    )
    assert v.shape == (3, 128)
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)
    sim_related = v[0] @ v[1]
    sim_unrelated = v[0] @ v[2]
    assert sim_related > sim_unrelated + 0.2
    # determinism across instances
    v2 = HashEmbedder(dim=128).encode(["apple revenue grew in the december quarter"])
    np.testing.assert_allclose(v[0], v2[0], rtol=1e-6)


def test_hash_reranker_and_rule():
    r = HashReranker()
    hits = [
        {"text": "the weather is nice today", "row": 0},
        {"text": "apple gross margin expanded to 45 percent", "row": 1},
        {"text": "microsoft cloud revenue", "row": 2},
    ]
    scores = r.score("what was apple's gross margin", [h["text"] for h in hits])
    top = rerank("q", hits, scores, top_k=2)
    assert top[0]["row"] == 1
    assert len(top) == 2
    assert top[0]["rerank_score"] >= top[1]["rerank_score"]


def test_identity_reranker_preserves_order():
    r = HashReranker(identity=True)
    scores = r.score("q", ["a", "b", "c"])
    assert list(np.argsort(scores)[::-1]) == [0, 1, 2]


@pytest.mark.parametrize("num_labels", [0, 1])
def test_torch_parity(tmp_path, num_labels):
    """Our forward must match HF transformers on identical weights."""
    torch = pytest.importorskip("torch")
    import transformers

    hf_cfg = transformers.BertConfig(
        vocab_size=512, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=64, type_vocab_size=2,
    )
    torch.manual_seed(0)
    if num_labels:
        model = transformers.BertForSequenceClassification(
            transformers.BertConfig(**{**hf_cfg.to_dict(), "num_labels": 1})
        )
    else:
        model = transformers.BertModel(hf_cfg)
    model.eval()
    torch.save(model.state_dict(), tmp_path / "pytorch_model.bin")
    (tmp_path / "config.json").write_text(hf_cfg.to_json_string())

    from financial_rag_system_tpu.models.hf_loader import load_bert_checkpoint

    params, cfg = load_bert_checkpoint(
        str(tmp_path), with_pooler=True, num_labels=num_labels
    )

    ids = np.array([[101, 5, 6, 7, 102, 0], [101, 9, 10, 102, 0, 0]], np.int32)
    mask = np.array([[1, 1, 1, 1, 1, 0], [1, 1, 1, 1, 0, 0]], np.int32)
    types = np.zeros_like(ids)

    with torch.no_grad():
        t_ids = torch.tensor(ids, dtype=torch.long)
        t_mask = torch.tensor(mask, dtype=torch.long)
        if num_labels:
            ref = model(t_ids, attention_mask=t_mask).logits.numpy()[:, 0]
            got = np.asarray(
                bert.cross_score(
                    params, jnp.asarray(ids), jnp.asarray(types),
                    jnp.asarray(mask), cfg,
                )
            )
        else:
            ref = model(t_ids, attention_mask=t_mask).last_hidden_state.numpy()
            got = np.asarray(
                bert.encode(params, jnp.asarray(ids), jnp.asarray(types),
                            jnp.asarray(mask), cfg)
            )
            ref = ref * mask[:, :, None]  # only compare real tokens
            got = got * mask[:, :, None]
    # bf16 matmuls vs torch f32: expect close but not bitwise
    np.testing.assert_allclose(got, ref, rtol=0.05, atol=0.05)
