"""Bi-encoder embedding service (the reference's ``get_embedder``).

Replaces ``SentenceTransformer("BAAI/bge-small-en-v1.5").encode``
(reference main.py:80-84, main2.py:88-96) with an on-device JAX forward:
tokenize -> bucketed padding -> jit-compiled BERT -> CLS pool ->
L2-normalize.  Exposed to ingestion through the `/embed` endpoint
exactly like the reference (main.py:144-149).

Weight sources, in priority order:
1. ``RAG_TPU_BGE_DIR`` — a local HF checkpoint (vocab.txt +
   pytorch_model.bin/safetensors), converted by models/hf_loader.
2. Deterministic :class:`HashEmbedder` — a seeded embedding-table
   bag-of-words model.  Fully hermetic (this environment has no model
   egress), deterministic across processes, and lexically meaningful,
   so retrieval-quality harnesses measure real index behavior.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.tokenizer import Tokenizer, pad_batch

MAX_DEVICE_BATCH = 64


class BiEncoder:
    """Full BERT bi-encoder with CLS ('bge') or mean pooling."""

    def __init__(
        self,
        params: dict,
        cfg: bert.BertConfig,
        tokenizer: Tokenizer,
        *,
        pooling: str = "cls",
        max_len: int = 512,
    ):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.pooling = pooling
        self.max_len = max_len
        self.dim = cfg.hidden

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        fwd = bert.embed_cls if self.pooling == "cls" else bert.embed_mean
        out: list[np.ndarray] = []
        for start in range(0, len(texts), MAX_DEVICE_BATCH):
            chunk = texts[start : start + MAX_DEVICE_BATCH]
            encs = [self.tokenizer.encode(t, self.max_len) for t in chunk]
            ids, types, mask = pad_batch(encs)
            vecs = fwd(self.params, jnp.asarray(ids), jnp.asarray(types),
                       jnp.asarray(mask), self.cfg)
            out.append(np.asarray(vecs[: len(chunk)], np.float32))
        return np.concatenate(out, axis=0)


# High-frequency terms whose overlap carries little relevance signal;
# their table rows are scaled down so rare-token overlap dominates cosine.
_STOPWORDS = (
    "a an and are as at be been but by did do does for from had has have he "
    "her his how i if in into is it its of on or our she so such that the "
    "their them then there these they this to was we were what when which "
    "who will with you your not no nor than too very can could would should "
    "percent billion million dollars company report period year quarter "
    "during other may also prior consistent"
).split()
_STOPWORD_SCALE = 0.15


def _hash_table(
    vocab_size: int, dim: int, seed: int = 7, stopword_ids: list[int] | None = None
) -> jax.Array:
    key = jax.random.PRNGKey(seed)
    table = jax.random.normal(key, (vocab_size, dim), jnp.float32)
    if stopword_ids:
        # scale in-place on device: a host round-trip here costs ~2 min
        # of server startup when the chip sits behind a network tunnel
        ids = jnp.asarray(stopword_ids, jnp.int32)
        table = table.at[ids].multiply(_STOPWORD_SCALE)
    return table


def _hash_embed_fn(table, ids, mask):
    m = mask[:, :, None].astype(jnp.float32)
    # down-weight repeated tokens within a text (crude tf saturation)
    vecs = table[ids] * m
    mean = jnp.sum(vecs, axis=1) / jnp.sum(m, axis=1).clip(1.0)
    return mean / jnp.linalg.norm(mean, axis=-1, keepdims=True).clip(1e-12)


class HashEmbedder:
    """Deterministic seeded bag-of-words embedder (hermetic fallback).

    Encodes on device: token ids index a fixed Gaussian table, masked
    mean pool, L2 normalize.  Cosine similarity then reflects lexical
    overlap — enough for the Hit@k/MRR harness to measure real index
    behavior without trained weights.
    """

    def __init__(self, dim: int = 384, *, max_len: int = 512, seed: int = 7):
        self.dim = dim
        self.max_len = max_len
        self.tokenizer = Tokenizer()
        stop_ids = sorted(
            {i for w in _STOPWORDS for i in self.tokenizer.tokenize_ids(w)}
        )
        self._table = _hash_table(
            self.tokenizer.vocab.vocab_size, dim, seed, stop_ids
        )
        self._fn = jax.jit(_hash_embed_fn)

    def encode(self, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), np.float32)
        out: list[np.ndarray] = []
        for start in range(0, len(texts), MAX_DEVICE_BATCH):
            chunk = texts[start : start + MAX_DEVICE_BATCH]
            encs = [self.tokenizer.encode(t, self.max_len) for t in chunk]
            ids, _, mask = pad_batch(encs)
            vecs = self._fn(self._table, jnp.asarray(ids), jnp.asarray(mask))
            out.append(np.asarray(vecs[: len(chunk)], np.float32))
        return np.concatenate(out, axis=0)


def get_embedder(dim: int = 384):
    """Factory mirroring the reference's lru_cache'd get_embedder."""
    ckpt = os.environ.get("RAG_TPU_BGE_DIR", "")
    if ckpt and os.path.isdir(ckpt):
        from financial_rag_system_tpu.models.hf_loader import (
            load_bert_checkpoint,
            saved_max_seq_length,
        )

        params, cfg = load_bert_checkpoint(ckpt, with_pooler=True)
        return BiEncoder(
            params, cfg, Tokenizer.from_dir(ckpt), pooling="cls",
            max_len=saved_max_seq_length(ckpt),
        )
    return HashEmbedder(dim)
