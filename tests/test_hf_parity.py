"""Numerical parity: HF torch BERT vs the JAX port, via the real loader.

The weight-porting path (models/hf_loader.py) is the acceptance gate for
serving the reference's exact models (BGE-small, MiniLM cross-encoder —
reference main.py:80-90).  No model downloads happen in this
environment, so the test builds a *random-init* HF checkpoint locally
with transformers, saves it to disk, loads it through hf_loader, and
compares forward passes — same FLOPs and layout as the real weights.

Tolerances are bf16-scale: the JAX side computes matmuls in bfloat16
with f32 accumulation by design (models/bert.py).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.hf_loader import load_bert_checkpoint


def _hf_config(num_labels=0):
    return transformers.BertConfig(
        vocab_size=512,
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=128,
        max_position_embeddings=96,
        type_vocab_size=2,
        num_labels=max(num_labels, 2),
    )


def _batch(rng, b=3, l=17, vocab=512):
    ids = rng.integers(5, vocab, (b, l)).astype(np.int64)
    mask = np.ones((b, l), np.int64)
    mask[0, 12:] = 0  # ragged mask exercises the attention masking
    mask[2, 9:] = 0
    types = np.zeros((b, l), np.int64)
    types[:, 10:] = 1
    ids[mask == 0] = 0
    return ids, types, mask


def test_encoder_hidden_states_match(tmp_path):
    torch.manual_seed(0)
    model = transformers.BertModel(_hf_config())
    model.eval()
    model.save_pretrained(tmp_path)

    params, cfg = load_bert_checkpoint(str(tmp_path), with_pooler=True)
    rng = np.random.default_rng(0)
    ids, types, mask = _batch(rng)

    with torch.no_grad():
        out = model(
            input_ids=torch.tensor(ids),
            token_type_ids=torch.tensor(types),
            attention_mask=torch.tensor(mask),
        )
    ref_h = out.last_hidden_state.numpy()
    ref_pooled = out.pooler_output.numpy()

    h = np.asarray(
        bert.encode(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(types, jnp.int32),
            jnp.asarray(mask, jnp.int32), cfg,
        )
    )
    # compare only unmasked positions; pad rows are unconstrained
    m = mask.astype(bool)
    diff = np.abs(h - ref_h)[m]
    scale = np.abs(ref_h)[m].mean()
    assert diff.max() / scale < 5e-2, (diff.max(), scale)

    pooled = np.asarray(
        jnp.tanh(
            bert._matmul(
                jnp.asarray(h[:, 0, :]), params["pooler"]["w"],
                params["pooler"]["b"],
            )
        )
    )
    assert np.abs(pooled - ref_pooled).max() < 5e-2


def test_cross_encoder_logits_match(tmp_path):
    torch.manual_seed(1)
    model = transformers.BertForSequenceClassification(_hf_config(num_labels=1))
    model.eval()
    model.save_pretrained(tmp_path)

    params, cfg = load_bert_checkpoint(
        str(tmp_path), with_pooler=True, num_labels=1
    )
    assert "classifier" in params, "classifier head must load"
    rng = np.random.default_rng(1)
    ids, types, mask = _batch(rng)

    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor(ids),
            token_type_ids=torch.tensor(types),
            attention_mask=torch.tensor(mask),
        ).logits.numpy()[:, 0]

    got = np.asarray(
        bert.cross_score(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(types, jnp.int32),
            jnp.asarray(mask, jnp.int32), cfg,
        )
    )
    assert got.shape == ref.shape
    assert np.abs(got - ref).max() < 5e-2, np.abs(got - ref).max()


def test_loader_rejects_missing_weights(tmp_path):
    (tmp_path / "config.json").write_text("{}")
    with pytest.raises((FileNotFoundError, KeyError)):
        load_bert_checkpoint(str(tmp_path))
