"""The RAG engine: cache -> route -> embed+retrieve -> rerank -> generate.

Orchestrates the full request pipeline with the reference's exact
behavioral surface (SURVEY.md §7 invariants):

- cache key ``sha256(f"{ticker}_{query.lower()}")``; hit returns
  provider "Cache" with the sentinel source (reference main.py:341-352)
- miss: SIMPLE/COMPLEX routing, retrieve 15 candidates (ticker must /
  optional document_type filters), cross-encoder rerank ->
  ``argsort[::-1][:top_k]``, breaker-guarded LLM generation with the
  degraded fallback, write-behind cache save skipped for degraded
  answers (main.py:412-415)
- response schema {query_hash, query, answer, sources[{score, text,
  document_type}], cached, provider} (main.py:417-424)

Two modes, mirroring the reference's two apps: "batched" (main2.py —
dynamic 50 ms/32 batching; embedding AND retrieval run as one device
program for the whole batch) and "sequential" (main.py — the latency
baseline).  Span taxonomy and per-stage latency metrics follow
main2.py:207-263.
"""

from __future__ import annotations

import asyncio
import threading
import time
from typing import Any

import numpy as np

from financial_rag_system_tpu.obs.tracing import get_tracer
from financial_rag_system_tpu.serving.batcher import DynamicBatcher
from financial_rag_system_tpu.serving.breaker import CircuitBreaker
from financial_rag_system_tpu.serving.cache import CacheDB
from financial_rag_system_tpu.serving.llm import (
    LLMClient,
    MockLLMClient,
    generate_answer,
)
from financial_rag_system_tpu.serving.router import route_query
from financial_rag_system_tpu.utils.config import Config
from financial_rag_system_tpu.utils.hashing import cache_key


class RAGEngine:
    def __init__(
        self,
        cfg: Config,
        index,
        embedder,
        reranker,
        *,
        mode: str = "batched",
        llm: LLMClient | None = None,
        cache: CacheDB | None = None,
        breaker: CircuitBreaker | None = None,
    ):
        assert mode in ("batched", "sequential")
        self.cfg = cfg
        self.index = index
        self.embedder = embedder
        self.reranker = reranker
        self.mode = mode
        # lazy: multi-process serving constructs a full engine on worker
        # processes that never answer HTTP — opening the shared cache DB
        # there adds a concurrent migration race (SQLite "database is
        # locked" on a contended 2-process cold start) for no reason
        self._cache = cache
        self._cache_lock = threading.Lock()
        self.breaker = breaker or CircuitBreaker(
            cfg.breaker_state_path, cfg.breaker_cooldown_s
        )
        self.llm = llm or (MockLLMClient(cfg) if cfg.testing else LLMClient(cfg))
        self.llm_semaphore = asyncio.Semaphore(cfg.max_concurrent_llm)
        self.tracer = get_tracer()
        self._fused_kind: str | None = None
        self._fused_fn = self._maybe_build_fused()
        # strong refs to fire-and-forget tasks (an unreferenced asyncio
        # task can be garbage-collected before it runs)
        self._bg_tasks: set[asyncio.Task] = set()
        self.batcher: DynamicBatcher | None = None
        if mode == "batched":
            self.batcher = DynamicBatcher(
                self._dispatch_batch,
                window_s=cfg.batch_window_s,
                max_batch=cfg.max_batch_size,
                eager_idle_s=cfg.batch_eager_idle_s,
            )

    @property
    def cache(self) -> CacheDB:
        if self._cache is None:
            with self._cache_lock:
                if self._cache is None:
                    self._cache = CacheDB(self.cfg.database_url)
        return self._cache

    def _dispatch_batch(self, queries, filters):
        """Late-bound batch fn so index/fusion swaps take effect live:
        try the fused single-program path, fall back to the staged
        pipeline whenever the batch is ineligible (no fused program,
        tail rows, selective filters, geometry race)."""
        out = self._fused_batch(queries, filters)
        if out is not None:
            return out
        return self._embed_retrieve_batch(queries, filters)

    def _maybe_build_fused(self):
        """One-program batch pipelines (ops/fused_query.py):

        - full model stack + device token store => embed+search+rerank
          fused ("full" kind);
        - hermetic hash stack => embed+search fused ("hash" kind); with
          a device token store and a non-identity HashReranker the
          DE-ALIASED hash rerank fuses too (``self._fused_hash_rerank``);
          with the identity reranker rerank order equals retrieval order
          by definition, so ce == bi is exact;
        - IVF tier => same two stacks with the flat scan replaced by
          centroid probing + the probed-tiles kernel ("ivf_full" /
          "ivf_hash"); the staged path keeps handling batches that need
          tail or selective-filter merging (see _fused_exec);
        - multi-process serving wraps the tier in a BroadcastIndex: the
          fused program is built for the INNER index (every process
          builds the identical program; the batch becomes one broadcast
          op — parallel/control.py fused_batch).

        int8 corpora fuse too: the programs quantize query vectors
        in-graph (ops/fused_query.py _prep_queries).
        """
        from financial_rag_system_tpu.index.flat import FlatIndex
        from financial_rag_system_tpu.index.ivf import IVFIndex
        from financial_rag_system_tpu.models.embedder import BiEncoder, HashEmbedder
        from financial_rag_system_tpu.models.reranker import (
            CrossEncoderReranker,
            HashReranker,
        )

        self._fused_kind = None
        self._fused_hash_rerank = False
        index = getattr(self.index, "inner", self.index)
        hash_stack = isinstance(self.embedder, HashEmbedder) and isinstance(
            self.reranker, HashReranker
        )
        if isinstance(index, IVFIndex):
            flat = index.flat
            if not isinstance(flat, FlatIndex):
                return None  # IVF over a non-flat base has no fused path
            quantized = flat.quantized
            common = dict(
                k=self.cfg.retrieve_k,
                tile=index.tile,
                nprobe=index.nprobe,
                tiles_per_cluster=index.tiles_per_cluster,
                use_pallas=flat.use_pallas,
                quantized=quantized,
            )
            # geometry captured at build: a churn-triggered auto-rebuild
            # (index/ivf.py _maintenance_due) can re-derive
            # nprobe/c_max/tiles_per_cluster — the fused program's tile
            # math would then probe silently wrong rows, so _fused_exec
            # compares this against the live index and falls back staged
            self._fused_ivf_geom = (
                index.nprobe, index.tiles_per_cluster, index.c_max,
            )
            if (
                isinstance(self.embedder, BiEncoder)
                and isinstance(self.reranker, CrossEncoderReranker)
                and flat._doc_tok is not None
            ):
                from financial_rag_system_tpu.ops.fused_query import (
                    make_fused_ivf_query,
                )

                self._fused_kind = "ivf_full"
                return make_fused_ivf_query(
                    self.embedder.cfg, self.reranker.cfg, **common
                )
            if hash_stack:
                from financial_rag_system_tpu.ops.fused_query import (
                    make_fused_ivf_hash_query,
                )

                self._fused_kind = "ivf_hash"
                self._fused_hash_rerank = (
                    not self.reranker.identity and flat._doc_tok is not None
                )
                return make_fused_ivf_hash_query(
                    **common, rerank=self._fused_hash_rerank
                )
            return None
        from financial_rag_system_tpu.index.hnsw import HNSWIndex
        from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
        from financial_rag_system_tpu.index.sharded_hnsw import (
            ShardedHNSWIndex,
        )
        from financial_rag_system_tpu.index.sharded_ivf import ShardedIVFIndex

        full_stack = isinstance(self.embedder, BiEncoder) and isinstance(
            self.reranker, CrossEncoderReranker
        )

        def has_store(idx) -> bool:
            # auto token stores materialize on the first ingest; the
            # fused program can be built before that (its shapes come
            # per-call) — _fused_exec falls back staged while the store
            # is still None
            return getattr(idx, "token_store_enabled", False) or (
                idx._doc_tok is not None
            )
        if isinstance(index, HNSWIndex):
            flat = index.flat
            if (
                isinstance(flat, FlatIndex)
                and full_stack
                and flat._doc_tok is not None
            ):
                from financial_rag_system_tpu.ops.fused_query import (
                    make_fused_hnsw_query,
                )

                state = index._graph_state
                self._fused_kind = "hnsw_full"
                pool_take = state[7][3] if state[7] is not None else 0
                # geometry captured at build (pad sentinel + which
                # routing aids the program embeds); _fused_exec compares
                # against the live snapshot and falls back on mismatch
                self._fused_hnsw_geom = (
                    state[2], state[6] is not None, pool_take,
                )
                descend = (
                    (index.descend_beam, index.descend_steps,
                     index.descend_frontier)
                    if state[6] is not None else None
                )
                return make_fused_hnsw_query(
                    self.embedder.cfg,
                    self.reranker.cfg,
                    k=self.cfg.retrieve_k,
                    ef=state[3],
                    steps=index.steps,
                    frontier=index.frontier,
                    pad_id=state[2],
                    quantized=flat.quantized,
                    descend=descend,
                    pool_take=pool_take,
                )
            return None
        if isinstance(index, ShardedHNSWIndex):
            flat = index.flat
            if full_stack and flat._doc_tok is not None:
                from financial_rag_system_tpu.ops.fused_query import (
                    make_sharded_fused_hnsw_query,
                )

                state = index._graph_state
                self._fused_kind = "hnsw_full"
                self._fused_hnsw_geom = (state[2], state[4], state[7])
                return make_sharded_fused_hnsw_query(
                    flat.mesh,
                    self.embedder.cfg,
                    self.reranker.cfg,
                    k=self.cfg.retrieve_k,
                    ef=max(index.ef, index.entries_cap + state[7]),
                    steps=index.steps,
                    frontier=index.frontier,
                    per_shard=state[2],
                    quantized=flat.quantized,
                    pool_take=state[7],
                )
            return None
        if isinstance(index, ShardedIVFIndex):
            flat = index.flat
            if (
                isinstance(self.embedder, BiEncoder)
                and isinstance(self.reranker, CrossEncoderReranker)
                and flat._doc_tok is not None
            ):
                from financial_rag_system_tpu.ops.fused_query import (
                    make_sharded_fused_ivf_query,
                )

                self._fused_kind = "ivf_full"
                # geometry captured at build; _fused_exec compares
                # against the live snapshot (a rebuild can change the
                # sharded packing; single-chip c_max is fixed at init)
                self._fused_ivf_geom = (
                    index.tiles_per_cluster,
                    index.packed_local,
                    flat.capacity,
                )
                return make_sharded_fused_ivf_query(
                    flat.mesh,
                    self.embedder.cfg,
                    self.reranker.cfg,
                    k=self.cfg.retrieve_k,
                    tile=index.tile,
                    nprobe=index.nprobe,
                    tiles_per_cluster=index.tiles_per_cluster,
                    rows_per_shard=flat.capacity // flat.n_shards,
                    use_pallas=flat.use_pallas,
                    quantized=flat.quantized,
                )
            return None
        if isinstance(index, ShardedFlatIndex):
            # mesh-sharded corpus: each shard embeds + searches its rows,
            # (B,k) partials all-gather for the global merge, and the
            # cross-encoder runs work-balanced over the merged set
            # (ops/fused_query._sharded_balanced_rerank) — same 1
            # sync/batch as the single-chip path with 1/S of its rerank
            # per device.  No tail/selective fallback conditions exist:
            # the sharded flat search is exact.
            if full_stack and has_store(index):
                from financial_rag_system_tpu.ops.fused_query import (
                    make_sharded_fused_query,
                )

                self._fused_kind = "full"
                return make_sharded_fused_query(
                    index.mesh,
                    self.embedder.cfg,
                    self.reranker.cfg,
                    k=self.cfg.retrieve_k,
                    tile=index.tile,
                    use_pallas=index.use_pallas,
                    quantized=index.quantized,
                )
            if hash_stack:
                from financial_rag_system_tpu.ops.fused_query import (
                    make_sharded_fused_hash_query,
                )

                self._fused_kind = "hash"
                self._fused_hash_rerank = (
                    not self.reranker.identity and has_store(index)
                )
                return make_sharded_fused_hash_query(
                    index.mesh,
                    k=self.cfg.retrieve_k,
                    tile=index.tile,
                    use_pallas=index.use_pallas,
                    quantized=index.quantized,
                    rerank=self._fused_hash_rerank,
                )
            return None
        if not isinstance(index, FlatIndex):
            return None
        quantized = index.quantized
        if full_stack and has_store(index):
            from financial_rag_system_tpu.ops.fused_query import make_fused_query

            self._fused_kind = "full"
            return make_fused_query(
                self.embedder.cfg,
                self.reranker.cfg,
                k=self.cfg.retrieve_k,
                tile=index.tile,
                use_pallas=index.use_pallas,
                quantized=quantized,
            )
        if hash_stack:
            from financial_rag_system_tpu.ops.fused_query import (
                make_fused_hash_query,
            )

            self._fused_kind = "hash"
            self._fused_hash_rerank = (
                not self.reranker.identity and has_store(index)
            )
            return make_fused_hash_query(
                k=self.cfg.retrieve_k,
                tile=index.tile,
                use_pallas=index.use_pallas,
                quantized=quantized,
                rerank=self._fused_hash_rerank,
            )
        return None

    # -- lifecycle ---------------------------------------------------------

    async def startup(self) -> None:
        if self.batcher is not None:
            self.batcher.start()

    async def shutdown(self) -> None:
        if self.batcher is not None:
            await self.batcher.stop()
        await self.llm.aclose()

    # -- batched device work -------------------------------------------------

    def _embed_retrieve_batch(
        self,
        queries: list[str],
        filters: list[tuple[str | None, str | None]],
    ) -> list[tuple[np.ndarray, list[dict[str, Any]]]]:
        """One device pass for the whole batch: embed then fused search."""
        vecs = self.embedder.encode(queries)
        hits = self.index.search_batch(vecs, filters, k=self.cfg.retrieve_k)
        return list(zip(vecs, hits))

    def _fused_batch(
        self,
        queries: list[str],
        filters: list[tuple[str | None, str | None]],
    ) -> list[tuple[Any, list[dict[str, Any]]]] | None:
        """Single-program batch: one device sync for embed+search(+rerank).

        Host wrapper around :meth:`_fused_exec`: tokenize the batch,
        execute the fused device program (as ONE broadcast op when the
        index is a multi-process BroadcastIndex — every per-batch input
        travels in the op; corpus state is lockstep-identical), then
        assemble payload hits.  Returns None when no fused program
        exists or the batch is ineligible (staged fallback).
        """
        if self._fused_fn is None:
            return None
        from financial_rag_system_tpu.models.tokenizer import pad_batch
        from financial_rag_system_tpu.parallel.control import BroadcastIndex

        index = self.index
        tok = self.embedder.tokenizer
        # queries truncate at 64 (ample for the reference workload: p95 is
        # ~22 tokens) capped by the embedder's trained length — positions
        # past a first-party checkpoint's trained length are random init
        lq = min(64, getattr(self.embedder, "max_len", 64) or 64)
        # per-stage wall breakdown for the warm-/ask audit (VERDICT r4
        # #5): host tokenize vs device program+fetch vs hit assembly,
        # logged as metrics so /metrics exposes p50/p95 of each
        t0 = time.time()
        encs = [tok.encode(q, lq) for q in queries]
        ids, types, mask = pad_batch(encs)
        codes = [index.store.query_codes(t, d) for t, d in filters]
        t_tok = time.time()
        if isinstance(index, BroadcastIndex):
            # one broadcast per batch; eligibility + state reads happen
            # INSIDE the op lock (identically on every process)
            res = index.fused_batch(
                ids, types, mask, codes,
                lambda: self._fused_exec(ids, types, mask, codes),
            )
        else:
            res = self._fused_exec(ids, types, mask, codes)
        if res is None:
            return None
        rows, bi, ce, qv, with_ce = res
        import jax

        rows, bi, ce = jax.device_get((rows, bi, ce))
        t_dev = time.time()
        self.tracer.log_metric("fused_tokenize_ms", (t_tok - t0) * 1000)
        self.tracer.log_metric("fused_device_ms", (t_dev - t_tok) * 1000)
        b = len(queries)
        vecs = list(np.asarray(qv)[:b]) if qv is not None else [None] * b
        store = index.store
        out = []
        for i in range(b):
            hits = []
            for r, s, c in zip(rows[i], bi[i], ce[i]):
                if r < 0 or not np.isfinite(s):
                    continue
                payload = store.get(int(r))
                payload["score"] = float(s)
                payload["row"] = int(r)
                if with_ce:
                    # device-computed stage-2 score: the per-request
                    # rerank reduces to a sort + slice
                    payload["rerank_score"] = float(c)
                hits.append(payload)
            out.append((vecs[i], hits))
        self.tracer.log_metric("fused_assemble_ms", (time.time() - t_dev) * 1000)
        return out

    def _fused_exec(self, ids, types, mask, codes):
        """Device portion of the fused batch — deterministic given the
        tokenized inputs + engine state, and therefore safe to run as a
        broadcast op on every process of a multi-process deployment
        (parallel/control.py worker_loop "fused").

        Captures (fused_fn, kind, index) together, re-reads every state
        snapshot at call time, and verifies kind <-> index-type
        consistency and geometry — a concurrent tier promotion or
        rebuild makes this return None (staged fallback) identically on
        every process rather than running a mismatched program.

        Returns (rows, bi, ce, qv, with_ce) device arrays (qv None for
        full kinds; with_ce False when rerank must run host-side), or
        None when the batch is ineligible.
        """
        import jax.numpy as jnp

        from financial_rag_system_tpu.index.base import selective_rows
        from financial_rag_system_tpu.index.flat import FlatIndex
        from financial_rag_system_tpu.index.hnsw import HNSWIndex
        from financial_rag_system_tpu.index.ivf import IVFIndex
        from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
        from financial_rag_system_tpu.index.sharded_hnsw import (
            ShardedHNSWIndex,
        )
        from financial_rag_system_tpu.index.sharded_ivf import ShardedIVFIndex

        fused, kind, hash_rerank = (
            self._fused_fn, self._fused_kind, self._fused_hash_rerank,
        )
        index = getattr(self.index, "inner", self.index)
        if fused is None or kind is None:
            return None
        b = len(codes)
        bpad = ids.shape[0]
        qf = jnp.asarray(list(codes) + [(-3, -3)] * (bpad - b), jnp.int32)
        j_ids, j_types, j_mask = (
            jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask),
        )

        if kind in ("full", "hash"):
            if not isinstance(index, (FlatIndex, ShardedFlatIndex)):
                return None  # tier promotion raced the program swap
            # one read of the array tuple: a concurrent upsert/grow must
            # not pair a new emb with old codes/token-store mid-batch
            emb, idx_codes, doc_tok = index._arrays
            if doc_tok is None and (kind == "full" or hash_rerank):
                return None  # auto token store not yet materialized
            nv = jnp.asarray(min(index.n_valid, emb.shape[0]), jnp.int32)
            if kind == "full":
                rows, bi, ce = fused(
                    self.embedder.params, self.reranker.params,
                    j_ids, j_types, j_mask, qf, emb, idx_codes, doc_tok, nv,
                )
                return rows, bi, ce, None, True
            identity = getattr(self.reranker, "identity", False)
            if isinstance(index, ShardedFlatIndex):
                qv, rows, bi, ce = fused(
                    self.embedder._table, self.reranker.table,
                    j_ids, j_mask, qf, emb, idx_codes,
                    # dtok is only consumed when the de-aliased rerank is
                    # fused; emb stands in to satisfy the fixed sharded
                    # signature otherwise
                    doc_tok if doc_tok is not None else emb, nv,
                )
            elif hash_rerank:
                qv, bi, rows, ce = fused(
                    self.embedder._table, self.reranker.table,
                    j_ids, j_mask, qf, emb, idx_codes, doc_tok, nv,
                )
            else:
                qv, bi, rows = fused(
                    self.embedder._table, j_ids, j_mask, qf,
                    emb, idx_codes, nv,
                )
                ce = bi
            return rows, bi, ce, qv, (hash_rerank or identity)

        if kind in ("ivf_full", "ivf_hash"):
            if not isinstance(index, (IVFIndex, ShardedIVFIndex)):
                return None
            if index._tail_rows:
                return None
            # one atomic read each: the IVF packing snapshot and the flat
            # array tuple (rows in packed_gids stay valid across appends)
            state = index._state
            centroids, packed_emb, packed_codes, packed_gids, rbt = state[:5]
            if isinstance(index, ShardedIVFIndex):
                # a rebuild can change the sharded packing geometry out
                # from under the fused program's captured tile math
                geom = state[5]  # (c_max, tiles_per_cluster, packed_local, _)
                live = (geom[1], geom[2], index.flat.capacity)
                if live != self._fused_ivf_geom:
                    return None
            else:
                # single-chip IVF: churn auto-rebuilds re-derive the
                # codebook/packing geometry (index/ivf.py) — stale
                # statics would probe wrong tiles
                live = (index.nprobe, index.tiles_per_cluster, index.c_max)
                if live != self._fused_ivf_geom:
                    return None
            if selective_rows(rbt, codes, index.SELECTIVE_LIMIT) is not None:
                return None
            if kind == "ivf_full":
                doc_tok = index.flat._arrays[2]
                rows, bi, ce = fused(
                    self.embedder.params, self.reranker.params,
                    j_ids, j_types, j_mask, qf,
                    centroids, packed_emb, packed_codes, packed_gids, doc_tok,
                )
                return rows, bi, ce, None, True
            identity = getattr(self.reranker, "identity", False)
            if hash_rerank:
                doc_tok = index.flat._arrays[2]
                qv, bi, rows, ce = fused(
                    self.embedder._table, self.reranker.table,
                    j_ids, j_mask, qf,
                    centroids, packed_emb, packed_codes, packed_gids, doc_tok,
                )
            else:
                qv, bi, rows = fused(
                    self.embedder._table, j_ids, j_mask, qf,
                    centroids, packed_emb, packed_codes, packed_gids,
                )
                ce = bi
            return rows, bi, ce, qv, (hash_rerank or identity)

        if kind == "hnsw_full":
            if not isinstance(index, (HNSWIndex, ShardedHNSWIndex)):
                return None
            if index._tail_rows:
                return None
            state = index._graph_state  # one atomic read
            if isinstance(index, ShardedHNSWIndex):
                (adj, entries, per_shard, _n, built_cap, rbt,
                 shard_pool, shard_take) = state
                if (
                    (per_shard, built_cap, shard_take)
                    != self._fused_hnsw_geom
                ):
                    return None
                if index.flat.capacity != built_cap:
                    return None
            else:
                adj, entries, pad_id, _ef, rbt, _n, hier, pool = state
                pool_take = pool[3] if pool is not None else 0
                if (
                    (pad_id, hier is not None, pool_take)
                    != self._fused_hnsw_geom
                ):
                    return None
            if selective_rows(rbt, codes, index.SELECTIVE_LIMIT) is not None:
                return None
            emb, idx_codes, doc_tok = index.flat._arrays
            if isinstance(index, HNSWIndex):
                import jax.numpy as jnp

                extra = {}
                if pool is not None and pool[3] > 0:
                    extra["pool_rows"] = pool[0]
                if hier is not None:
                    hi_ids_dev, hi_adj_dev, hi_n = hier
                    extra.update(
                        hi_ids=hi_ids_dev, hi_adj=hi_adj_dev,
                        hi_n=jnp.int32(hi_n),
                    )
                rows, bi, ce = fused(
                    self.embedder.params, self.reranker.params,
                    j_ids, j_types, j_mask, qf,
                    emb, idx_codes, adj, entries, doc_tok,
                    **extra,
                )
            else:
                args = (
                    self.embedder.params, self.reranker.params,
                    j_ids, j_types, j_mask, qf,
                    emb, idx_codes, adj, entries, doc_tok,
                )
                if shard_take > 0:
                    args = args + (shard_pool,)
                rows, bi, ce = fused(*args)
            return rows, bi, ce, None, True
        return None  # pragma: no cover — unknown kind

    # -- public API -----------------------------------------------------------

    async def embed(self, texts: list[str]) -> list[list[float]]:
        """The /embed endpoint used by ingestion (reference main.py:144-149)."""
        vecs = await asyncio.to_thread(self.embedder.encode, texts)
        return np.asarray(vecs).tolist()

    async def ask(
        self,
        query: str,
        ticker: str,
        top_k: int = 5,
        document_type: str | None = None,
    ) -> dict[str, Any]:
        arrival = time.time()
        q_hash = cache_key(ticker, query)

        cached = await asyncio.to_thread(self.cache.lookup, q_hash, ticker.upper())
        if cached is not None:
            return {
                "query_hash": q_hash,
                "query": query,
                "answer": cached,
                "sources": [
                    {"score": 1.0, "text": "Semantic Cache", "document_type": "Cache"}
                ],
                "cached": True,
                "provider": "Cache",
            }

        with self.tracer.span(
            "RAG_Workflow", kind="CHAIN",
            inputs={"user_query": query, "ticker": ticker},
        ) as root:
            async with self.llm_semaphore:
                with self.tracer.span("1_Query_Routing", kind="TOOL"):
                    t0 = time.time()
                    complexity = route_query(query)
                    self.tracer.log_metric("router_ms", (time.time() - t0) * 1000)

                t0 = time.time()
                with self.tracer.span(
                    "2_Vector_Retrieval", kind="RETRIEVER",
                    inputs={"ticker": ticker, "k": self.cfg.retrieve_k},
                ) as sp:
                    if self.batcher is not None:
                        _vec, hits = await self.batcher.submit(
                            query, ticker, document_type
                        )
                    else:  # sequential baseline path
                        _vec, hits = (
                            await asyncio.to_thread(
                                self._dispatch_batch,
                                [query],
                                [(ticker, document_type)],
                            )
                        )[0]
                    sp.outputs = [h["text"] for h in hits]
                self.tracer.log_metric("retrieval_ms", (time.time() - t0) * 1000)
                self.tracer.log_metric("retrieved_docs", len(hits))

                t0 = time.time()
                with self.tracer.span("3_Reranking", kind="TOOL") as sp:
                    if hits and "rerank_score" in hits[0]:
                        # fused path scored the pairs on device already
                        sp.attrs["fused"] = True
                        scores = np.asarray([h["rerank_score"] for h in hits])
                        order = np.argsort(scores)[::-1][:top_k]
                        top = [hits[int(i)] for i in order]
                    elif hits:
                        scores = await asyncio.to_thread(
                            self.reranker.score, query, [h["text"] for h in hits]
                        )
                        order = np.argsort(scores)[::-1][:top_k]
                        top = [
                            {**hits[int(i)], "rerank_score": float(scores[int(i)])}
                            for i in order
                        ]
                    else:
                        top = []
                self.tracer.log_metric("rerank_ms", (time.time() - t0) * 1000)
                self.tracer.log_metric("reranked_docs", len(top))

                context = "\n\n".join(h["text"] for h in top)
                t0 = time.time()
                with self.tracer.span("LLM_Generation", kind="LLM") as sp:
                    answer, provider = await generate_answer(
                        self.llm, self.breaker, query, context, complexity
                    )
                    sp.outputs = answer
                self.tracer.log_metric("llm_ms", (time.time() - t0) * 1000)
                self.tracer.log_metric(
                    "total_e2e_ms", (time.time() - arrival) * 1000
                )
                root.outputs = answer
                root.attrs.update(
                    {"complexity": complexity, "provider": provider, "top_k": top_k}
                )

        if provider != "System Degraded":
            # write-behind (reference main.py:412-415)
            task = asyncio.get_running_loop().create_task(
                asyncio.to_thread(
                    self.cache.save, q_hash, ticker, query, answer, provider
                )
            )
            self._bg_tasks.add(task)
            task.add_done_callback(self._bg_tasks.discard)

        return {
            "query_hash": q_hash,
            "query": query,
            "answer": answer,
            "sources": [
                {
                    "score": h.get("rerank_score", h.get("score", 0.0)),
                    "text": h["text"],
                    "document_type": h.get("document_type", "SEC Filing"),
                }
                for h in top
            ],
            "cached": False,
            "provider": provider,
        }

    async def ingest_chunks(
        self,
        ids: list[str],
        texts: list[str],
        payloads: list[dict[str, Any]],
    ) -> int:
        """Embed on device and upsert into the in-process index.

        The backend half of ingestion: the reference's ingestor embeds
        via POST /embed then upserts to a Qdrant server (ingest.py:52-66,
        171-175); here both happen in one device pass behind
        POST /index/upsert.
        """

        def work() -> int:
            vecs = self.embedder.encode(texts)
            return self.index.upsert(ids, vecs, texts, payloads)

        with self.tracer.span("Index_Upsert", kind="TOOL", inputs={"n": len(ids)}):
            return await asyncio.to_thread(work)

    def rebuild_index(self, tier: str | None = None) -> dict[str, Any]:
        """Promote the flat index to a sub-linear tier, or rebuild the
        current tier after tail growth.  Fusion re-evaluates afterwards.

        tier: "ivf" | "hnsw" | None (None keeps the current tier, or
        defaults a flat index to IVF — the better fit for this hardware).
        """
        from financial_rag_system_tpu.index.flat import FlatIndex
        from financial_rag_system_tpu.index.hnsw import HNSWIndex
        from financial_rag_system_tpu.index.ivf import IVFIndex

        from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
        from financial_rag_system_tpu.index.sharded_ivf import ShardedIVFIndex

        current = type(self.index).__name__
        if self.index.n_valid == 0:
            return {"status": "noop", "reason": "index empty"}
        from financial_rag_system_tpu.parallel.control import BroadcastIndex

        if isinstance(self.index, BroadcastIndex):
            # multi-process: the rebuild is itself a broadcast op so every
            # process runs the same collective build program; workers
            # re-fuse inside worker_loop, the coordinator re-fuses here
            out = self.index.rebuild_tier(tier)
            self._fused_fn = self._maybe_build_fused()
            return out
        flat = getattr(self.index, "flat", self.index)
        if isinstance(flat, ShardedFlatIndex):
            from financial_rag_system_tpu.index.sharded_hnsw import (
                ShardedHNSWIndex,
            )

            # mesh-sharded corpus: sub-linear tiers are sharded IVF
            # (default) or per-shard-graph HNSW (index/sharded_hnsw.py)
            if tier == "hnsw":
                if isinstance(self.index, ShardedHNSWIndex):
                    self.index.rebuild()
                else:
                    self.index = ShardedHNSWIndex(flat)
            elif isinstance(self.index, ShardedIVFIndex):
                self.index.rebuild()
            elif isinstance(self.index, ShardedHNSWIndex) and tier is None:
                self.index.rebuild()
            else:
                self.index = ShardedIVFIndex(flat, tile=min(flat.tile, 128))
            self._fused_fn = self._maybe_build_fused()
            return {
                "status": "ok",
                "tier": type(self.index).__name__,
                "clusters": getattr(self.index, "n_clusters", None),
                "tail_rows": len(self.index._tail_rows),
            }
        if not isinstance(flat, FlatIndex):
            return {"status": "noop", "reason": f"{current} has no tiers"}
        want = tier or {"IVFIndex": "ivf", "HNSWIndex": "hnsw"}.get(
            current, "ivf"
        )
        if want == "ivf":
            if isinstance(self.index, IVFIndex):
                self.index.rebuild()
            else:
                self.index = IVFIndex(flat, tile=min(flat.tile, 128))
        elif want == "hnsw":
            if isinstance(self.index, HNSWIndex):
                self.index.rebuild()
            else:
                self.index = HNSWIndex(flat)
        else:
            return {"status": "error", "reason": f"unknown tier {want!r}"}
        self._fused_fn = self._maybe_build_fused()
        return {
            "status": "ok",
            "tier": type(self.index).__name__,
            "clusters": getattr(self.index, "n_clusters", None),
            "tail_rows": len(getattr(self.index, "_tail_rows", [])),
        }

    # -- ops surface -----------------------------------------------------------

    def feedback(self, query_hash: str, rating: int) -> None:
        self.cache.add_feedback(query_hash, rating)

    def clear_cache(self, ticker: str) -> int:
        return self.cache.clear_ticker(ticker)

    def queue_status(self) -> dict[str, Any]:
        inner = getattr(self.index, "inner", None)
        tier = (
            f"Broadcast[{type(inner).__name__}]"
            if inner is not None
            else type(self.index).__name__
        )
        return {
            "mode": self.mode,
            "queue_size": self.batcher.queue_size if self.batcher else 0,
            # ops visibility: which index tier serves and whether the
            # single-program fused pipeline is active (and which kind)
            "index_tier": tier,
            "fused_kind": self._fused_kind,
            # hash stack only: whether the de-aliased stage-2 hash rerank
            # runs inside the fused program (vs host-side)
            "fused_hash_rerank": self._fused_hash_rerank,
        }

    def ready(self) -> dict[str, Any]:
        try:
            n = self.index.n_valid
            return {"status": "ready", "indexed_chunks": n}
        except Exception as exc:  # pragma: no cover
            return {"status": "not_ready", "error": str(exc)}
