"""Device-resident flat (exact) vector index.

The TPU-native replacement for the reference's Qdrant collection +
``query_points`` call (reference main.py:215-239, ingest.py:171-175):
corpus embeddings live in HBM as one padded (capacity, D) array with a
parallel (2, capacity) metadata-code array; search is the fused
masked-matmul/top-k op (:mod:`financial_rag_system_tpu.ops.topk`), so a
query batch costs one kernel launch and no host round-trips.

Capacity is padded to the Pallas tile size and grows geometrically on
overflow; padding rows carry code ``-2`` and are masked by ``n_valid``.
Persistence is a .npz of the device arrays + the JSON document store —
this is the checkpoint/resume story the reference lacked (SURVEY.md
§5.4: durable state there was Qdrant's own volume).
"""

from __future__ import annotations

import os
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.index.base import SearchMixin
from financial_rag_system_tpu.index.store import PAD_CODE, DocumentStore
from financial_rag_system_tpu.ops.topk import masked_topk

DEFAULT_TILE = 1024

# ceiling for auto-sized token stores: a 1000-char reference chunk is
# ~200-260 wordpieces, and the fused rerank truncates pairs at the
# reranker's max_seq_length anyway (ops/fused_query._cross_rerank)
DEFAULT_TOKEN_STORE_MAX = 384


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def auto_token_width(
    lengths, *, cap: int = DEFAULT_TOKEN_STORE_MAX, multiple: int = 8,
    floor: int = 16,
) -> int:
    """Token-store width from measured wordpiece lengths: p99 rounded up.

    The sizing policy bench.py applied by hand (measured p99 chunk = 75
    tokens -> DLEN 80), now applied at ingest (VERDICT r4 #1): store
    width IS rerank latency when rerank dominates batch FLOPs, and a
    static width silently truncates realistic 1000-char chunks.
    ``lengths`` must already include the trailing SEP.
    """
    if not len(lengths):
        return floor
    p99 = int(np.percentile(np.asarray(lengths), 99))
    return max(floor, min(cap, _round_up(p99, multiple)))


class FlatIndex(SearchMixin):
    """Exact cosine search over an HBM-resident corpus."""

    def __init__(
        self,
        dim: int = 384,
        *,
        capacity: int = 8192,
        tile: int = DEFAULT_TILE,
        dtype: jnp.dtype = jnp.bfloat16,
        use_pallas: bool = True,
        token_store_len: int | str | None = None,
        tokenizer=None,
        token_store_max: int = DEFAULT_TOKEN_STORE_MAX,
    ):
        from financial_rag_system_tpu.ops.topk import pallas_available

        self.dim = dim
        self.tile = tile
        self.dtype = jnp.dtype(dtype)
        # int8 mode: rows are L2-normalized then symmetrically quantized
        # (round(v*127)); queries take the same treatment, so scores are
        # cosine * 127^2 — a constant scale that leaves ranking intact
        # while halving HBM again vs bf16 (~20M chunks/chip)
        self.quantized = self.dtype == jnp.int8
        # normalize at construction so every consumer (flat search, the
        # engine's fused single-program path) sees a flag that is safe to
        # dispatch on — Pallas cannot lower compiled kernels on CPU.
        # int8 rides the same kernel (tiles widen in VMEM; ops/topk.py)
        # behind the FRS_INT8_PALLAS kill switch.
        from financial_rag_system_tpu.ops.topk import int8_pallas_enabled

        self.use_pallas = (
            use_pallas
            and pallas_available()
            and (not self.quantized or int8_pallas_enabled())
        )
        self.capacity = _round_up(max(capacity, tile), tile)
        self.store = DocumentStore()
        # "auto": the store materializes on the first upsert at the
        # measured p99 wordpiece width (auto_token_width) and widens in
        # 32-token steps if later ingests measure longer — instead of a
        # static width that silently truncates realistic chunks
        self._auto_dlen = token_store_len == "auto" and tokenizer is not None
        if token_store_len == "auto":
            token_store_len = None
        self.token_store_len = token_store_len
        self.token_store_max = token_store_max
        self._tok_lengths: list[int] = []
        self.tokenizer = tokenizer
        # device arrays live in ONE tuple (emb, codes, doc_tok) swapped as
        # a unit: writers (upsert/_grow, which may change capacity) and
        # readers run in different threads, and a reader pairing a grown
        # emb with an ungrown codes would crash the whole batch.  The
        # _emb/_codes/_doc_tok properties are views; consistency-critical
        # readers take self._arrays once.
        self._arrays = (
            jnp.zeros((self.capacity, dim), dtype=dtype),
            jnp.full((2, self.capacity), PAD_CODE, dtype=jnp.int32),
            # optional device token store: pretokenized chunk ids resident
            # in HBM so the fused program reranks without host round trips
            (
                jnp.zeros((self.capacity, token_store_len), jnp.int32)
                if token_store_len
                else None
            ),
        )

    # -- device-array views (see _arrays comment) -------------------------
    @property
    def _emb(self):
        return self._arrays[0]

    @_emb.setter
    def _emb(self, v):
        self._arrays = (v, self._arrays[1], self._arrays[2])

    @property
    def _codes(self):
        return self._arrays[1]

    @_codes.setter
    def _codes(self, v):
        self._arrays = (self._arrays[0], v, self._arrays[2])

    @property
    def _doc_tok(self):
        return self._arrays[2]

    @_doc_tok.setter
    def _doc_tok(self, v):
        self._arrays = (self._arrays[0], self._arrays[1], v)

    # ------------------------------------------------------------------
    @property
    def n_valid(self) -> int:
        return len(self.store)

    @property
    def token_store_enabled(self) -> bool:
        """True when a device token store exists OR will materialize on
        the first ingest (auto mode) — what fused-program construction
        should gate on (the program's shapes come per-call)."""
        return self._doc_tok is not None or self._auto_dlen

    def _grow(self, needed: int) -> None:
        new_cap = self.capacity
        while new_cap < needed:
            new_cap *= 2
        new_cap = _round_up(new_cap, self.tile)
        old_emb, old_codes, old_dtok = self._arrays
        emb = jax.lax.dynamic_update_slice(
            jnp.zeros((new_cap, self.dim), dtype=self.dtype), old_emb, (0, 0)
        )
        codes = jax.lax.dynamic_update_slice(
            jnp.full((2, new_cap), PAD_CODE, dtype=jnp.int32), old_codes, (0, 0)
        )
        dtok = (
            jax.lax.dynamic_update_slice(
                jnp.zeros((new_cap, self.token_store_len), jnp.int32),
                old_dtok, (0, 0),
            )
            if old_dtok is not None
            else None
        )
        self._arrays = (emb, codes, dtok)  # one swap
        self.capacity = new_cap

    def upsert(
        self,
        ids: Sequence[str],
        vectors: np.ndarray,
        texts: Sequence[str],
        payloads: Sequence[dict[str, Any]],
    ) -> int:
        """Idempotent batched upsert (reference ingest.py:171-175).

        Returns the number of *new* rows.  Vectors are L2-normalized on
        the way in so search is pure dot-product cosine.
        """
        assert len(ids) == len(vectors) == len(texts) == len(payloads)
        if not len(ids):
            return 0
        vecs = np.asarray(vectors, np.float32)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        vecs = vecs / np.maximum(norms, 1e-12)
        if self.quantized:
            vecs = np.clip(np.rint(vecs * 127.0), -127, 127)

        rows, code_rows, new_count = [], [], 0
        for pid, text, payload in zip(ids, texts, payloads):
            row, is_new = self.store.upsert(pid, text, payload)
            new_count += is_new
            rows.append(row)
            code_rows.append(self.store.codes_for(payload))
        if len(self.store) > self.capacity:
            self._grow(len(self.store))

        tok_rows = None
        if self.tokenizer is not None and (
            self._doc_tok is not None or self._auto_dlen
        ):
            from financial_rag_system_tpu.models.tokenizer import SEP_ID

            tid_lists = [self.tokenizer.tokenize_ids(t) for t in texts]
            if self._auto_dlen:
                # sizes/widens self._doc_tok + token_store_len (one
                # _arrays swap) BEFORE the batch rows are written below
                self._autosize_token_store(
                    [len(t) + 1 for t in tid_lists]
                )
            dlen = self.token_store_len
            tok_rows = np.zeros((len(texts), dlen), np.int32)
            for i, tids in enumerate(tid_lists):
                tids = tids[: dlen - 1] + [SEP_ID]
                tok_rows[i, : len(tids)] = tids

        rows_a = np.asarray(rows, np.int64)
        emb, codes, dtok = self._arrays
        # scatter rows on device; contiguous appends take the fast slice path
        if np.array_equal(rows_a, np.arange(rows_a[0], rows_a[0] + len(rows_a))):
            start = int(rows_a[0])
            emb = jax.lax.dynamic_update_slice(
                emb, jnp.asarray(vecs, self.dtype), (start, 0)
            )
            codes = jax.lax.dynamic_update_slice(
                codes,
                jnp.asarray(np.asarray(code_rows, np.int32).T),
                (0, start),
            )
            if tok_rows is not None:
                dtok = jax.lax.dynamic_update_slice(
                    dtok, jnp.asarray(tok_rows), (start, 0)
                )
        else:
            emb = emb.at[rows_a].set(jnp.asarray(vecs, self.dtype))
            codes = codes.at[:, rows_a].set(
                jnp.asarray(np.asarray(code_rows, np.int32).T)
            )
            if tok_rows is not None:
                dtok = dtok.at[rows_a].set(jnp.asarray(tok_rows))
        self._arrays = (emb, codes, dtok)  # one swap
        return new_count

    def _autosize_token_store(self, lengths: list[int]) -> None:
        """Auto mode: materialize the store at the measured p99 width, or
        widen it when later ingests measure longer chunks.

        Deterministic in the upsert stream (pure function of the batch
        texts), so multi-process op-broadcast serving stays in lockstep.
        Widening rounds up to 32-token steps to bound fused-program
        retraces, and rebuilds every stored row from the host-resident
        texts so earlier rows aren't left truncated at the old width.
        """
        self._tok_lengths.extend(lengths)
        want = auto_token_width(self._tok_lengths, cap=self.token_store_max)
        cur = self.token_store_len or 0
        if self._doc_tok is None:
            self.token_store_len = want
            self._doc_tok = jnp.zeros((self.capacity, want), jnp.int32)
            return
        if want <= cur:
            return
        new_w = min(_round_up(want, 32), self.token_store_max)
        if new_w <= cur:
            return
        from financial_rag_system_tpu.models.tokenizer import SEP_ID

        self.token_store_len = new_w
        n = len(self.store)
        rebuilt = np.zeros((self.capacity, new_w), np.int32)
        for r in range(n):
            tids = self.tokenizer.tokenize_ids(
                self.store.texts[r]
            )[: new_w - 1] + [SEP_ID]
            rebuilt[r, : len(tids)] = tids
        self._doc_tok = jnp.asarray(rebuilt)

    # ------------------------------------------------------------------
    def search_device(
        self,
        query_vecs: jax.Array,
        query_filter: jax.Array,
        k: int,
        *,
        host_codes=None,
    ) -> tuple[jax.Array, jax.Array]:
        """Device-level search: (B, D) x (B, 2) codes -> (B, k) scores/rows."""
        emb, codes, _ = self._arrays  # one read: emb/codes stay paired
        return masked_topk(
            self.prep_queries(query_vecs),
            emb,
            codes,
            query_filter,
            min(self.n_valid, emb.shape[0]),
            k,
            tile=self.tile,
            use_pallas=self.use_pallas,
        )

    def prep_queries(self, query_vecs):
        """Match queries to the corpus representation (cast, or the same
        symmetric int8 quantization as the rows)."""
        if self.quantized:
            q = query_vecs.astype(jnp.float32) * 127.0
            return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
        return query_vecs.astype(self.dtype)

    # search()/search_batch() come from SearchMixin.

    # ------------------------------------------------------------------
    def save(self, directory: str) -> None:
        os.makedirs(directory, exist_ok=True)
        arrays = {
            "emb": np.asarray(self._emb, np.float32),
            "codes": np.asarray(self._codes),
            "meta": np.asarray(
                [
                    self.dim, self.tile, self.capacity,
                    self.token_store_len or 0, int(self.quantized),
                ]
            ),
        }
        if self._doc_tok is not None:
            arrays["doc_tok"] = np.asarray(self._doc_tok)
        np.savez_compressed(os.path.join(directory, "flat_index.npz"), **arrays)
        self.store.save(os.path.join(directory, "store.json"))

    @staticmethod
    def load(
        directory: str, *, use_pallas: bool = True, tokenizer=None
    ) -> "FlatIndex":
        data = np.load(os.path.join(directory, "flat_index.npz"))
        meta = [int(x) for x in data["meta"]]
        dim, tile, capacity = meta[:3]
        dlen = meta[3] if len(meta) > 3 and meta[3] else None
        quantized = bool(meta[4]) if len(meta) > 4 else False
        idx = FlatIndex(
            dim, capacity=capacity, tile=tile, use_pallas=use_pallas,
            token_store_len=dlen, tokenizer=tokenizer,
            dtype=jnp.int8 if quantized else jnp.bfloat16,
        )
        idx._emb = jnp.asarray(data["emb"], idx.dtype)
        idx._codes = jnp.asarray(data["codes"])
        if dlen and "doc_tok" in data:
            idx._doc_tok = jnp.asarray(data["doc_tok"])
        idx.store = DocumentStore.load(os.path.join(directory, "store.json"))
        return idx
