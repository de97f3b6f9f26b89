"""Convert locally stored HF BERT checkpoints to the functional pytree.

Weight-porting path for parity with the reference's exact models
(``BAAI/bge-small-en-v1.5`` and ``cross-encoder/ms-marco-MiniLM-L-6-v2``,
reference main.py:80-90): given an on-disk HF checkpoint directory
(config.json + pytorch_model.bin or model.safetensors + vocab.txt),
produce the stacked-layer param dict consumed by models/bert.py.  Torch
``Linear`` stores (out, in); our matmuls are x @ W so every dense weight
is transposed on the way in.  No network access is ever attempted.
"""

from __future__ import annotations

import json
import os

import numpy as np

import jax.numpy as jnp

from financial_rag_system_tpu.models.bert import BertConfig


def _read_state_dict(ckpt_dir: str) -> dict[str, np.ndarray]:
    st = os.path.join(ckpt_dir, "model.safetensors")
    if os.path.exists(st):
        try:
            from safetensors.numpy import load_file

            return dict(load_file(st))
        except ImportError:
            pass
    bins = [
        f for f in ("pytorch_model.bin", "pytorch_model.pt")
        if os.path.exists(os.path.join(ckpt_dir, f))
    ]
    if not bins:
        raise FileNotFoundError(f"no weights file in {ckpt_dir}")
    import torch

    sd = torch.load(
        os.path.join(ckpt_dir, bins[0]), map_location="cpu", weights_only=True
    )
    return {k: v.numpy() for k, v in sd.items()}


def saved_max_seq_length(ckpt_dir: str, default: int = 512) -> int:
    """Trained sequence length from sentence_bert_config.json (the
    sentence-transformers convention; models/hf_export.py writes it) —
    serving must truncate where training did, or untrained position
    embeddings shift the score distribution."""
    path = os.path.join(ckpt_dir, "sentence_bert_config.json")
    try:
        with open(path) as f:
            return int(json.load(f)["max_seq_length"])
    except (OSError, KeyError, ValueError, TypeError):
        # sentence-transformers writes null when unset; non-dict roots
        # and missing files mean the same thing: no hint
        return default


def load_bert_checkpoint(
    ckpt_dir: str,
    *,
    with_pooler: bool = True,
    num_labels: int = 0,
    layers: int | None = None,
) -> tuple[dict, BertConfig]:
    """Returns (params, cfg) for models/bert.encode and friends."""
    with open(os.path.join(ckpt_dir, "config.json")) as f:
        hf = json.load(f)
    cfg = BertConfig(
        vocab_size=hf["vocab_size"],
        hidden=hf["hidden_size"],
        layers=layers or hf["num_hidden_layers"],
        heads=hf["num_attention_heads"],
        intermediate=hf["intermediate_size"],
        max_positions=hf["max_position_embeddings"],
        type_vocab=hf.get("type_vocab_size", 2),
        ln_eps=hf.get("layer_norm_eps", 1e-12),
        with_pooler=with_pooler,
        num_labels=num_labels,
    )
    sd = _read_state_dict(ckpt_dir)
    # cross-encoders ship as BertForSequenceClassification with a bert. prefix
    prefix = "bert." if any(k.startswith("bert.") for k in sd) else ""

    def g(name: str) -> np.ndarray:
        return np.asarray(sd[prefix + name], np.float32)

    params: dict = {
        "embeddings": {
            "word": jnp.asarray(g("embeddings.word_embeddings.weight")),
            "position": jnp.asarray(g("embeddings.position_embeddings.weight")),
            "type": jnp.asarray(g("embeddings.token_type_embeddings.weight")),
            "ln_scale": jnp.asarray(g("embeddings.LayerNorm.weight")),
            "ln_bias": jnp.asarray(g("embeddings.LayerNorm.bias")),
        }
    }

    def stack(fmt: str, transpose: bool = False) -> jnp.ndarray:
        arrs = [g(fmt.format(i)) for i in range(cfg.layers)]
        if transpose:
            arrs = [a.T for a in arrs]
        return jnp.asarray(np.stack(arrs))

    params["layers"] = {
        "q_w": stack("encoder.layer.{}.attention.self.query.weight", True),
        "q_b": stack("encoder.layer.{}.attention.self.query.bias"),
        "k_w": stack("encoder.layer.{}.attention.self.key.weight", True),
        "k_b": stack("encoder.layer.{}.attention.self.key.bias"),
        "v_w": stack("encoder.layer.{}.attention.self.value.weight", True),
        "v_b": stack("encoder.layer.{}.attention.self.value.bias"),
        "o_w": stack("encoder.layer.{}.attention.output.dense.weight", True),
        "o_b": stack("encoder.layer.{}.attention.output.dense.bias"),
        "attn_ln_scale": stack("encoder.layer.{}.attention.output.LayerNorm.weight"),
        "attn_ln_bias": stack("encoder.layer.{}.attention.output.LayerNorm.bias"),
        "in_w": stack("encoder.layer.{}.intermediate.dense.weight", True),
        "in_b": stack("encoder.layer.{}.intermediate.dense.bias"),
        "out_w": stack("encoder.layer.{}.output.dense.weight", True),
        "out_b": stack("encoder.layer.{}.output.dense.bias"),
        "mlp_ln_scale": stack("encoder.layer.{}.output.LayerNorm.weight"),
        "mlp_ln_bias": stack("encoder.layer.{}.output.LayerNorm.bias"),
    }
    if with_pooler and (prefix + "pooler.dense.weight") in sd:
        params["pooler"] = {
            "w": jnp.asarray(g("pooler.dense.weight").T),
            "b": jnp.asarray(g("pooler.dense.bias")),
        }
    if num_labels and "classifier.weight" in sd:
        params["classifier"] = {
            "w": jnp.asarray(np.asarray(sd["classifier.weight"], np.float32).T),
            "b": jnp.asarray(np.asarray(sd["classifier.bias"], np.float32)),
        }
    return params, cfg
