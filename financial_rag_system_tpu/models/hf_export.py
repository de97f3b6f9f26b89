"""Export the functional BERT pytree as an HF-format checkpoint dir.

Inverse of models/hf_loader.py: writes ``config.json`` +
``pytorch_model.bin`` so a model trained in this framework (the
contrastive bi-encoder, the cross-encoder reranker — train/) can be
served through the same ``RAG_TPU_BGE_DIR`` / ``RAG_TPU_RERANKER_DIR``
path as a downloaded checkpoint (models/embedder.get_embedder,
models/reranker.get_reranker).  Torch ``Linear`` stores (out, in), so
every dense weight transposes on the way out — the exact mirror of the
loader's transpose-in.

No ``vocab.txt`` is written when training used the deterministic
HashVocab: ``Tokenizer.from_dir`` falls back to the hash vocab on a
missing file, so the served model tokenizes identically to training.
"""

from __future__ import annotations

import json
import os

import numpy as np

from financial_rag_system_tpu.models.bert import BertConfig


def save_bert_checkpoint(
    params: dict,
    cfg: BertConfig,
    ckpt_dir: str,
    *,
    cross_encoder: bool = False,
    max_seq_length: int | None = None,
) -> None:
    """Write config.json + pytorch_model.bin for ``load_bert_checkpoint``.

    ``cross_encoder`` uses the ``bert.``-prefixed
    BertForSequenceClassification layout (classifier stays unprefixed),
    matching how HF ships ms-marco cross-encoders.

    ``max_seq_length`` persists the TRAINED sequence length in
    sentence_bert_config.json (the sentence-transformers convention) so
    serving truncates exactly where training did: a model fine-tuned on
    64-token inputs scores measurably worse when served at 512 (hard
    mode 78.6%/0.732 vs 85.7%/0.830 — positions past the trained length
    were never updated from init).
    """
    import torch

    os.makedirs(ckpt_dir, exist_ok=True)
    if max_seq_length:
        with open(
            os.path.join(ckpt_dir, "sentence_bert_config.json"), "w"
        ) as f:
            json.dump({"max_seq_length": int(max_seq_length)}, f)
    hf_cfg = {
        "architectures": [
            "BertForSequenceClassification" if cross_encoder else "BertModel"
        ],
        "model_type": "bert",
        "vocab_size": cfg.vocab_size,
        "hidden_size": cfg.hidden,
        "num_hidden_layers": cfg.layers,
        "num_attention_heads": cfg.heads,
        "intermediate_size": cfg.intermediate,
        "max_position_embeddings": cfg.max_positions,
        "type_vocab_size": cfg.type_vocab,
        "layer_norm_eps": cfg.ln_eps,
        "hidden_act": "gelu",
    }
    with open(os.path.join(ckpt_dir, "config.json"), "w") as f:
        json.dump(hf_cfg, f, indent=1)

    prefix = "bert." if cross_encoder else ""
    sd: dict[str, "torch.Tensor"] = {}

    def put(name: str, arr, transpose: bool = False) -> None:
        a = np.asarray(arr, np.float32)
        if transpose:
            a = a.T
        sd[prefix + name] = torch.from_numpy(np.ascontiguousarray(a))

    emb = params["embeddings"]
    put("embeddings.word_embeddings.weight", emb["word"])
    put("embeddings.position_embeddings.weight", emb["position"])
    put("embeddings.token_type_embeddings.weight", emb["type"])
    put("embeddings.LayerNorm.weight", emb["ln_scale"])
    put("embeddings.LayerNorm.bias", emb["ln_bias"])

    lp = params["layers"]
    names = [
        ("q_w", "attention.self.query.weight", True),
        ("q_b", "attention.self.query.bias", False),
        ("k_w", "attention.self.key.weight", True),
        ("k_b", "attention.self.key.bias", False),
        ("v_w", "attention.self.value.weight", True),
        ("v_b", "attention.self.value.bias", False),
        ("o_w", "attention.output.dense.weight", True),
        ("o_b", "attention.output.dense.bias", False),
        ("attn_ln_scale", "attention.output.LayerNorm.weight", False),
        ("attn_ln_bias", "attention.output.LayerNorm.bias", False),
        ("in_w", "intermediate.dense.weight", True),
        ("in_b", "intermediate.dense.bias", False),
        ("out_w", "output.dense.weight", True),
        ("out_b", "output.dense.bias", False),
        ("mlp_ln_scale", "output.LayerNorm.weight", False),
        ("mlp_ln_bias", "output.LayerNorm.bias", False),
    ]
    for i in range(cfg.layers):
        for key, hf_name, transpose in names:
            put(f"encoder.layer.{i}.{hf_name}", lp[key][i], transpose)

    if "pooler" in params:
        put("pooler.dense.weight", params["pooler"]["w"], True)
        put("pooler.dense.bias", params["pooler"]["b"])
    if "classifier" in params:
        # classifier lives OUTSIDE the bert. prefix (HF sequence
        # classification layout — hf_loader reads it unprefixed)
        w = np.asarray(params["classifier"]["w"], np.float32).T
        sd["classifier.weight"] = torch.from_numpy(np.ascontiguousarray(w))
        sd["classifier.bias"] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(params["classifier"]["b"], np.float32))
        )

    torch.save(sd, os.path.join(ckpt_dir, "pytorch_model.bin"))
