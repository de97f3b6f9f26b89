"""IVF (inverted-file) index tier for million-chunk corpora.

The reference's Qdrant server uses HNSW for sub-linear search; graph
walks are branchy and hostile to SIMD hardware, so the TPU-native
sub-linear tier is IVF re-designed around static shapes and DMA
scheduling:

- **Build**: spherical k-means on device (jitted Lloyd iterations:
  assignment is one matmul+argmax on the MXU, update is a segment-sum).
- **Layout**: cluster-major packing with *fixed capacity* per cluster
  (C_max, a multiple of the kernel tile) so cluster membership maps to
  tile indices statically.  Rows that overflow their cluster spill to a
  brute-forced flat *tail* — no recall loss, bounded memory waste.
- **Query**: one compiled program: score queries against centroids,
  take each query's top-nprobe clusters, build the batch-union tile
  list with ``jnp.unique(size=...)`` (static probe budget), then a
  Pallas kernel with ``PrefetchScalarGridSpec`` whose index_map reads
  the tile list — only probed tiles are ever DMA'd from HBM.  The
  union-of-probes design means every query sees at least its own probed
  clusters (extra tiles only improve recall).
- **Upserts** after build are ONLINE: each new row is assigned to its
  nearest centroid and scattered into that cluster's packed block while
  free slots remain (the packing over-allocates to C_max per cluster),
  so the probed search sees it immediately — Qdrant's immediate-upsert
  semantics (reference ingest.py:171-175).  Only when a cluster's block
  is full does the row spill to the brute-forced tail; ``rebuild()``
  folds spills back in and re-balances.  Search merges IVF hits with
  tail hits either way.

Replaces: Qdrant HNSW build+query (reference ingest.py:171-175,
main.py:215-239) at the 1M-chunk tier of BASELINE.json config 3.
"""

from __future__ import annotations

import functools
import threading
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from financial_rag_system_tpu.index.base import SearchMixin
from financial_rag_system_tpu.index.store import PAD_CODE
from financial_rag_system_tpu.ops.topk import NEG_INF, _BIG_I32, masked_topk_xla

# ---------------------------------------------------------------------------
# k-means build
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def spherical_kmeans(
    vecs: jax.Array, k: int, *, iters: int = 10, seed: int = 0,
    init_cent: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Cosine k-means. vecs (N, D) L2-normalized. Returns (centroids, assign).

    ``init_cent`` (k, D) overrides the random-row init.  The Lloyd step
    KEEPS a centroid whose cluster goes empty, so k-center init points
    covering clusters absent from ``vecs`` (a training sample) survive —
    that property is what lets the build k-center-init over the FULL
    corpus and Lloyd over a sample (see _build).
    """
    n, d = vecs.shape
    if init_cent is not None:
        cent = init_cent.astype(vecs.dtype)
    else:
        key = jax.random.PRNGKey(seed)
        init_idx = jax.random.choice(key, n, (k,), replace=False)
        cent = vecs[init_idx]

    def step(cent, _):
        scores = jnp.dot(vecs, cent.T, preferred_element_type=jnp.float32)
        assign = jnp.argmax(scores, axis=1)  # (N,)
        onehot = jax.nn.one_hot(assign, k, dtype=vecs.dtype)  # (N, k)
        sums = jnp.dot(onehot.T, vecs, preferred_element_type=jnp.float32)
        norms = jnp.linalg.norm(sums, axis=1, keepdims=True)
        # keep the old centroid when a cluster went empty
        new_cent = jnp.where(norms > 1e-6, sums / norms.clip(1e-6), cent)
        return new_cent.astype(vecs.dtype), None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    assign = jnp.argmax(
        jnp.dot(vecs, cent.T, preferred_element_type=jnp.float32), axis=1
    )
    return cent, assign


# ---------------------------------------------------------------------------
# probed-tiles Pallas kernel
# ---------------------------------------------------------------------------


def _ivf_kernel(
    tile_ids_ref,  # scalar prefetch (PROBE_BUDGET,) int32, -1 = inactive
    q_ref,  # (B, D)
    qf_ref,  # (B, 2)
    c_ref,  # (T, D) — packed-corpus tile selected by index_map
    codes_ref,  # (2, T)
    gids_ref,  # (1, T) int32 original row ids, -1 = padding
    out_s_ref,  # (B, K)
    out_i_ref,  # (B, K)
    *,
    k: int,
    tile: int,
    int8_mxu: bool = False,
):
    step = pl.program_id(0)
    b = q_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.full_like(out_i_ref, -1)

    @pl.when(tile_ids_ref[step] >= 0)
    def _process():
        # int8 scoring mirrors ops/topk.py _topk_kernel: native
        # int8 x int8 -> int32 systolic passes when int8_mxu (exact —
        # |score| <= 127*127*D < 2^24), else widen tiles to f32 in VMEM.
        q, c = q_ref[:], c_ref[:]
        if q.dtype == jnp.int8 and int8_mxu:
            s = jax.lax.dot_general(
                q,
                c,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            if q.dtype == jnp.int8:
                q, c = q.astype(jnp.float32), c.astype(jnp.float32)
            s = jnp.dot(q, c.T, preferred_element_type=jnp.float32)
        tick_q = qf_ref[:, 0:1]
        dt_q = qf_ref[:, 1:2]
        tick_c = codes_ref[0:1, :]
        dt_c = codes_ref[1:2, :]
        match = ((tick_q == -1) | (tick_q == tick_c)) & (
            (dt_q == -1) | (dt_q == dt_c)
        )
        gids = jnp.broadcast_to(gids_ref[0:1, :], (b, tile))
        match = match & (gids >= 0)
        s = jnp.where(match, s, NEG_INF)

        tile_max = jnp.max(s, axis=1)
        kth_best = out_s_ref[:, k - 1]

        @pl.when(jnp.any(tile_max > kth_best))
        def _merge():
            cat_s = jnp.concatenate([out_s_ref[:], s], axis=1)
            cat_i = jnp.concatenate([out_i_ref[:], gids], axis=1)
            width = k + tile
            pos = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
            for j in range(k):
                m = jnp.max(cat_s, axis=1, keepdims=True)
                first = jnp.min(
                    jnp.where(cat_s == m, pos, _BIG_I32), axis=1, keepdims=True
                )
                sel = pos == first
                out_s_ref[:, j : j + 1] = m
                out_i_ref[:, j : j + 1] = jnp.sum(
                    jnp.where(sel, cat_i, 0), axis=1, keepdims=True
                )
                cat_s = jnp.where(sel, NEG_INF, cat_s)


def ivf_probe_pallas(
    queries: jax.Array,  # (B, D)
    query_filter: jax.Array,  # (B, 2)
    packed_emb: jax.Array,  # (K_cl*C_max, D)
    packed_codes: jax.Array,  # (2, K_cl*C_max)
    packed_gids: jax.Array,  # (1, K_cl*C_max)
    tile_ids: jax.Array,  # (probe_budget,) int32, -1 padded
    k: int,
    *,
    tile: int,
    probe_budget: int,
    interpret: bool = False,
    int8_mxu: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Probed-tiles fused top-k over the cluster-major packing.

    ``int8_mxu=None`` resolves the native-int8-MXU default from the
    environment (ops/topk.py int8_mxu_enabled).  Callers inside jitted
    program builders resolve it at trace time — FRS_INT8_MXU is a
    process-start kill switch, same contract as the fused programs.
    """
    if int8_mxu is None:
        from financial_rag_system_tpu.ops.topk import int8_mxu_enabled

        int8_mxu = int8_mxu_enabled()
    return _ivf_probe_pallas_jit(
        queries, query_filter, packed_emb, packed_codes, packed_gids,
        tile_ids, k, tile=tile, probe_budget=probe_budget,
        interpret=interpret, int8_mxu=int8_mxu,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "probe_budget", "interpret", "int8_mxu"),
)
def _ivf_probe_pallas_jit(
    queries: jax.Array,  # (B, D)
    query_filter: jax.Array,  # (B, 2)
    packed_emb: jax.Array,  # (K_cl*C_max, D)
    packed_codes: jax.Array,  # (2, K_cl*C_max)
    packed_gids: jax.Array,  # (1, K_cl*C_max)
    tile_ids: jax.Array,  # (probe_budget,) int32, -1 padded
    k: int,
    *,
    tile: int,
    probe_budget: int,
    interpret: bool = False,
    int8_mxu: bool = False,
) -> tuple[jax.Array, jax.Array]:
    b, d = queries.shape

    def tile_map(i, tile_ids):
        t = jnp.maximum(tile_ids[i], 0)
        return (t, 0)

    def codes_map(i, tile_ids):
        t = jnp.maximum(tile_ids[i], 0)
        return (0, t)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(probe_budget,),
        in_specs=[
            pl.BlockSpec((b, d), lambda i, tid: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2), lambda i, tid: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), tile_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), codes_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), codes_map, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda i, tid: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i, tid: (0, 0), memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(
        _ivf_kernel, k=k, tile=tile, int8_mxu=int8_mxu
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        interpret=interpret,
    )(tile_ids, queries, query_filter, packed_emb, packed_codes, packed_gids)


def ivf_probe_xla(
    queries, query_filter, packed_emb, packed_codes, packed_gids, tile_ids, k,
    *, tile,
):
    """Gather-then-score fallback with identical semantics."""
    t = jnp.maximum(tile_ids, 0)  # (P,)
    offs = t[:, None] * tile + jnp.arange(tile)[None, :]  # (P, tile)
    active = (tile_ids >= 0)[:, None]
    pos = jnp.where(active, offs, 0).reshape(-1)  # (P*tile,)
    emb = packed_emb[pos]  # (P*tile, D)
    codes = packed_codes[:, pos]
    gids = jnp.where(
        active.reshape(-1, 1).repeat(tile, axis=1).reshape(-1),
        packed_gids[0, pos],
        -1,
    )
    scores = jnp.dot(
        queries.astype(emb.dtype), emb.T, preferred_element_type=jnp.float32
    )
    tick_q, dt_q = query_filter[:, 0:1], query_filter[:, 1:2]
    match = ((tick_q == -1) | (tick_q == codes[0:1, :])) & (
        (dt_q == -1) | (dt_q == codes[1:2, :])
    )
    match = match & (gids[None, :] >= 0)
    scores = jnp.where(match, scores, NEG_INF)
    top_s, top_pos = jax.lax.top_k(scores, k)
    top_i = jnp.where(top_s > NEG_INF, gids[top_pos], -1)
    return top_s, top_i.astype(jnp.int32)


def probe_tile_list(
    queries: jax.Array, centroids: jax.Array, *, nprobe: int, tpc: int,
    budget: int,
) -> jax.Array:
    """Batch-union probed tile ids, -1 padded to ``budget`` (traceable)."""
    scores = jnp.dot(
        queries.astype(jnp.float32),
        centroids.T.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    _, clusters = jax.lax.top_k(scores, nprobe)  # (B, nprobe)
    tiles = (
        clusters[..., None] * tpc + jnp.arange(tpc)[None, None, :]
    ).reshape(-1)
    return jnp.unique(tiles, size=budget, fill_value=-1).astype(jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "budget", "nprobe", "tpc", "use_pallas"),
)
def ivf_probe_search(
    queries, query_filter, centroids, packed_emb, packed_codes,
    packed_gids, k, *, tile, budget, nprobe, tpc, use_pallas,
):
    """Centroid scoring + probe-list union + probe kernel, ONE program.

    The staged path used to run these as eager per-op dispatches, each
    paying the tunneled chip's ~33 ms RPC floor (1006 ms/query at the 1M
    tier).  The fused serving programs always inlined this sequence;
    this jit gives the staged tier the same single round trip.
    """
    tile_ids = probe_tile_list(
        queries, centroids, nprobe=nprobe, tpc=tpc, budget=budget
    )
    if use_pallas:
        return ivf_probe_pallas(
            queries, query_filter, packed_emb, packed_codes,
            packed_gids, tile_ids, k, tile=tile, probe_budget=budget,
        )
    return ivf_probe_xla(
        queries, query_filter, packed_emb, packed_codes,
        packed_gids, tile_ids, k, tile=tile,
    )


# ---------------------------------------------------------------------------
# index
# ---------------------------------------------------------------------------


class IVFIndex(SearchMixin):
    """Sub-linear tier built from (and sharing the store of) a FlatIndex."""

    # filters matching at most this many packed rows bypass probing and
    # are scored exactly over their inverted list (see search_device)
    SELECTIVE_LIMIT = 8192

    def __init__(
        self,
        flat,
        *,
        n_clusters: int | None = None,
        c_max: int | None = None,
        nprobe: int | None = None,
        tile: int = 128,
        kmeans_iters: int = 10,
        auto_rebuild_tail_frac: float = 0.10,
        auto_rebuild_growth_frac: float = 0.50,
    ):
        self.flat = flat
        self.store = flat.store
        self.dtype = flat.dtype
        self.tile = tile
        # centroid maintenance under churn (VERDICT r3 #8): sustained
        # online upserts against a frozen codebook degrade two ways —
        # the brute-forced tail grows (latency) and nearest-STALE-centroid
        # placement drifts from what a fresh k-means would assign
        # (recall).  Both are bounded by deterministic auto-rebuild
        # triggers checked at upsert time (see _maintenance_due); <= 0
        # disables a trigger.  Qdrant's online semantics (the reference's
        # bar, ingest.py:171-175) never degrade unboundedly either — its
        # HNSW inserts maintain the structure per-upsert; here the
        # equivalent is periodic re-clustering amortized over upserts.
        self.auto_rebuild_tail_frac = auto_rebuild_tail_frac
        self.auto_rebuild_growth_frac = auto_rebuild_growth_frac
        n = flat.n_valid
        assert n > 0, "build the flat index first"
        # explicit geometry pins across rebuilds; auto (None) re-derives
        # from the CURRENT corpus size at every (re)build, so a corpus
        # that grew under churn gets a codebook and packed capacity sized
        # for what it is now, not what it was at first build
        self._want_clusters = n_clusters
        self._want_cmax = c_max
        self._want_nprobe = nprobe
        self._derive_geometry(n)
        self.kmeans_iters = kmeans_iters
        self._upsert_lock = threading.Lock()
        self._state, self._tail_rows = self._build()
        self._built_n = len(self._state[5])  # rows covered at last build

    # -- build ----------------------------------------------------------

    # Lloyd iterations run on at most this many sampled rows; the full
    # corpus then gets one assignment pass.  Statistically equivalent at
    # these cluster counts and keeps the k-means program size bounded.
    KMEANS_SAMPLE = 131072

    def _derive_geometry(self, n: int) -> None:
        """(Re)size the codebook/packing for an n-row corpus — pinned
        dimensions (explicit constructor args) stay put."""
        self.n_clusters = min(
            n, self._want_clusters or max(4, int(np.sqrt(n / 4)))
        )
        # default probe width scales with the codebook: 8 covers the
        # <=256-cluster regime; larger codebooks keep probing the same
        # 1/32 fraction (measured on 1M trained embeddings: k-center-init
        # cluster recall 0.946 @ 8/512 probes, 1.000 @ 16/512)
        nprobe = (
            self._want_nprobe
            if self._want_nprobe is not None
            else max(8, self.n_clusters // 32)
        )
        self.nprobe = min(nprobe, self.n_clusters)
        avg = max(1, n // self.n_clusters)
        want = self._want_cmax or 2 * avg
        self.c_max = ((want + self.tile - 1) // self.tile) * self.tile
        self.tiles_per_cluster = self.c_max // self.tile

    def _build(self):
        """k-means + packing; returns (state, tail) for an atomic swap."""
        flat = self.flat
        n = flat.n_valid
        self._derive_geometry(n)
        vecs = flat._emb[:n].astype(jnp.float32)
        # k-center init over the FULL corpus (not the Lloyd sample): the
        # farthest-point sweep reaches tiny outlier clusters a random
        # sample misses entirely, and spherical_kmeans keeps a centroid
        # whose sample-cluster is empty — measured on 1M trained
        # embeddings this lifts cluster recall 0.679 -> 0.946 at
        # nprobe=8 (1.000 at 16) vs random init, and converges faster.
        # Shared routing utility with the HNSW entry pool (index/hnsw.py).
        from financial_rag_system_tpu.index.hnsw import kcenter_rows

        kc, _ = kcenter_rows(
            flat._emb, jnp.int32(n), pool=self.n_clusters
        )
        init = vecs[kc]
        init = init / jnp.linalg.norm(init, axis=1, keepdims=True).clip(
            1e-6
        )
        if n > self.KMEANS_SAMPLE:
            sample_rows = jnp.asarray(
                np.random.default_rng(0).choice(
                    n, self.KMEANS_SAMPLE, replace=False
                )
            )
            cent, _ = spherical_kmeans(
                vecs[sample_rows], self.n_clusters,
                iters=self.kmeans_iters, init_cent=init,
            )
            # chunked assignment: the full (N, K) score matrix is tens of
            # GB at the 1M tier; each chunk peaks at ~2 GB transient
            parts = []
            for s in range(0, n, self.KMEANS_SAMPLE):
                parts.append(
                    jnp.argmax(
                        jnp.dot(
                            vecs[s : s + self.KMEANS_SAMPLE], cent.T,
                            preferred_element_type=jnp.float32,
                        ),
                        axis=1,
                    )
                )
            assign = jnp.concatenate(parts)
        else:
            cent, assign = spherical_kmeans(
                vecs, self.n_clusters, iters=self.kmeans_iters,
                init_cent=init,
            )
        # only the (N,) assignment crosses to the host; the corpus
        # embeddings are packed in HBM by a device scatter — at the 1M
        # tier a host round trip here is ~1.5 GB each way
        return self._pack(np.asarray(assign), np.asarray(cent, np.float32))

    def _pack(self, assign: np.ndarray, cent: np.ndarray):
        """Cluster-major packing of rows [0, len(assign)) from an
        assignment vector — shared by fresh builds and persisted loads.
        Returns (state, tail): one tuple so concurrent searches read a
        consistent (centroids, packing, inverted-lists) snapshot while
        ``rebuild`` replaces it."""
        from financial_rag_system_tpu.index.base import build_ticker_lists

        flat = self.flat
        n = assign.shape[0]
        assign = assign.astype(np.int32)
        # centroid values are unit-norm floats: an int8 cast would
        # truncate them to ~zeros, so quantized indexes keep bf16 centroids
        cent_dtype = jnp.bfloat16 if getattr(
            flat, "quantized", False
        ) else self.dtype
        centroids = jnp.asarray(cent).astype(cent_dtype)
        rows_by_ticker = build_ticker_lists(flat, n)
        packed_n = self.n_clusters * self.c_max
        # cluster-major packing: stable-sort rows by cluster, compute each
        # row's within-cluster rank, spill ranks >= c_max to the tail
        order = np.argsort(assign, kind="stable")
        sorted_assign = assign[order]
        counts = np.bincount(assign, minlength=self.n_clusters)
        starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        within = np.arange(n, dtype=np.int64) - starts[sorted_assign]
        keep = within < self.c_max
        # host-side row -> packed-position map so upsert() can mask the
        # stale packed copy of a re-upserted row (-1 = tail/overflow)
        row_to_pos = np.full(n, -1, np.int64)
        row_to_pos[order[keep]] = sorted_assign[keep] * self.c_max + within[keep]
        rows_kept = jnp.asarray(order[keep])
        pos = jnp.asarray(sorted_assign[keep] * self.c_max + within[keep])
        # cluster-overflow spills plus any rows past the packed range
        # (rows upserted after a persisted build) — all brute-forced
        tail = [int(r) for r in order[~keep]] + list(range(n, flat.n_valid))

        packed_emb = (
            jnp.zeros((packed_n, flat._emb.shape[1]), self.dtype)
            .at[pos]
            .set(flat._emb[rows_kept].astype(self.dtype))
        )
        packed_codes = (
            jnp.full((2, packed_n), PAD_CODE, jnp.int32)
            .at[:, pos]
            .set(flat._codes[:, rows_kept])
        )
        packed_gids = (
            jnp.full((1, packed_n), -1, jnp.int32)
            .at[0, pos]
            .set(rows_kept.astype(jnp.int32))
        )
        # per-cluster fill counts: how many packed slots each cluster
        # block already uses — the free-slot map for online upserts
        fill = np.minimum(counts, self.c_max).astype(np.int32)
        state = (
            centroids, packed_emb, packed_codes, packed_gids,
            rows_by_ticker, assign, row_to_pos, fill,
        )
        return state, tail

    # attribute views over the atomic snapshot
    @property
    def centroids(self):
        return self._state[0]

    @property
    def packed_emb(self):
        return self._state[1]

    @property
    def packed_codes(self):
        return self._state[2]

    @property
    def packed_gids(self):
        return self._state[3]

    @property
    def _rows_by_ticker(self):
        return self._state[4]

    @property
    def _assign(self):
        return self._state[5]

    @property
    def num_tiles(self) -> int:
        return self.n_clusters * self.c_max // self.tile

    def rebuild(self) -> None:
        """Fold tail/new rows back into the clustered layout.  The old
        packing keeps serving during the build; the swap runs under the
        upsert lock so a concurrent online insert can never publish into
        a snapshot the rebuild is about to replace (lost update)."""
        with self._upsert_lock:
            self._rebuild_locked()

    def _rebuild_locked(self) -> None:
        state, tail = self._build()
        self._state, self._tail_rows = state, tail
        self._built_n = len(state[5])

    def _maintenance_due(self) -> bool:
        """Deterministic churn triggers (checked under ``_upsert_lock``):

        - tail bound: the brute-forced tail exceeding
          ``auto_rebuild_tail_frac`` of the corpus (with an absolute
          floor of one tile so small indexes don't rebuild on noise)
          costs latency on every search;
        - growth bound: ``auto_rebuild_growth_frac`` net new rows since
          the last k-means means the frozen codebook no longer reflects
          the data distribution even when every row found a packed slot
          (placement quality drifts, probes start missing).

        Determinism matters: under op-broadcast serving every process
        evaluates the same host counts and reaches the same decision, so
        the rebuild's device programs stay in collective lockstep.
        """
        n = self.flat.n_valid
        if (
            self.auto_rebuild_tail_frac > 0
            and len(self._tail_rows) > max(self.tile, int(
                self.auto_rebuild_tail_frac * n))
        ):
            return True
        grown = n - self._built_n
        return (
            self.auto_rebuild_growth_frac > 0
            and grown > self.auto_rebuild_growth_frac * max(self._built_n, 1)
        )

    @property
    def n_valid(self) -> int:
        return self.flat.n_valid

    @property
    def probe_budget(self) -> int:
        # batch-union worst case, clamped at the whole packed corpus
        return self.num_tiles

    # -- query ------------------------------------------------------------

    def _tile_list(
        self, queries: jax.Array, budget: int, centroids: jax.Array
    ) -> jax.Array:
        """Batch-union probed tile ids, -1 padded to ``budget``."""
        return probe_tile_list(
            queries, centroids, nprobe=self.nprobe,
            tpc=self.tiles_per_cluster, budget=budget,
        )

    def search_device(
        self, query_vecs: jax.Array, query_filter: jax.Array, k: int,
        *, host_codes=None,
    ) -> tuple[jax.Array, jax.Array]:
        from financial_rag_system_tpu.index.base import (
            merge_candidates,
            score_rows,
            selective_rows,
        )

        state = self._state  # one atomic read: packing stays consistent
        centroids, packed_emb, packed_codes, packed_gids, rbt = state[:5]
        tail = self._tail_rows
        b = query_vecs.shape[0]
        budget = min(
            self.num_tiles, b * self.nprobe * self.tiles_per_cluster
        )
        q = self.flat.prep_queries(query_vecs)
        # centroid scoring, probe-list union, and the probe kernel run as
        # ONE jitted program: eager per-op dispatch here multiplied the
        # tunnel's ~33 ms RPC floor (measured 1006 ms/query staged at 1M
        # before this; the fused serving path always inlined it)
        on_tpu = jax.devices()[0].platform == "tpu"
        s, i = ivf_probe_search(
            q, query_filter, centroids, packed_emb, packed_codes,
            packed_gids, k,
            tile=self.tile, budget=budget, nprobe=self.nprobe,
            tpc=self.tiles_per_cluster,
            use_pallas=bool(self.flat.use_pallas and on_tpu),
        )
        extras = []
        # same cardinality strategy as the HNSW tier: selective filters
        # are scored exactly over their inverted lists — cluster probing
        # can miss matching rows whose clusters the query doesn't probe
        rows = selective_rows(rbt, host_codes, self.SELECTIVE_LIMIT)
        if rows is not None:
            extras.append(score_rows(self.flat, rows, q, query_filter, k))
        if tail:
            extras.append(
                score_rows(self.flat, np.asarray(tail), q, query_filter, k)
            )
        return merge_candidates(s, i, extras, k)

    # -- upserts: online cluster placement, tail only on overflow ----------

    def upsert(self, ids, vectors, texts, payloads) -> int:
        existing = [
            self.store.id_to_row[p] for p in ids if p in self.store.id_to_row
        ]
        start = self.flat.n_valid
        added = self.flat.upsert(ids, vectors, texts, payloads)
        end = self.flat.n_valid
        with self._upsert_lock:
            if existing:
                # re-upserted rows: flat arrays are fresh but the packed
                # IVF copy is stale — mask the packed slot (one-tuple
                # state swap) and serve the row from the brute-forced
                # tail until rebuild()
                state = self._state
                row_to_pos = state[6]
                masked = [
                    r for r in existing
                    if r < len(row_to_pos) and row_to_pos[r] >= 0
                ]
                if masked:
                    gids = state[3].at[0, jnp.asarray(row_to_pos[masked])].set(
                        -1
                    )
                    rtp = row_to_pos.copy()
                    rtp[masked] = -1
                    self._state = state[:3] + (gids,) + state[4:6] + (
                        rtp,
                    ) + state[7:]
                    self._tail_rows.extend(masked)
            if end > start:
                self._online_insert(start, end)
            if self._maintenance_due():
                self._rebuild_locked()
        return added

    def _online_insert(self, start: int, end: int) -> None:
        """Place rows [start, end) into their nearest centroid's packed
        block where free slots remain (the probed search then sees them
        immediately); overflowing rows spill to the tail.  Runs under
        ``_upsert_lock``; the state swap is one tuple assignment so
        concurrent searches read a consistent packing."""
        flat = self.flat
        state = self._state
        (centroids, packed_emb, packed_codes, packed_gids,
         rbt, assign, row_to_pos, fill) = state
        if len(assign) != start:
            # a persisted load or racing rebuild left a coverage gap:
            # keep the simple contract for these rows
            self._tail_rows.extend(range(start, end))
            return
        rows = np.arange(start, end)
        vecs = flat._emb[jnp.asarray(rows)].astype(jnp.float32)
        if getattr(flat, "quantized", False):
            vecs = vecs / 127.0
        new_assign = np.asarray(
            jnp.argmax(
                jnp.dot(vecs, centroids.T.astype(jnp.float32),
                        preferred_element_type=jnp.float32),
                axis=1,
            ),
            np.int32,
        )
        fill = fill.copy()
        new_rtp = np.full(end - start, -1, np.int64)
        placed_idx, positions, tail_new = [], [], []
        for i, c in enumerate(new_assign):
            if fill[c] < self.c_max:
                positions.append(int(c) * self.c_max + int(fill[c]))
                placed_idx.append(i)
                new_rtp[i] = positions[-1]
                fill[c] += 1
            else:
                tail_new.append(int(rows[i]))
        if placed_idx:
            pos = jnp.asarray(np.asarray(positions, np.int64))
            prows = jnp.asarray(rows[placed_idx])
            packed_emb = packed_emb.at[pos].set(
                flat._emb[prows].astype(self.dtype)
            )
            packed_codes = packed_codes.at[:, pos].set(flat._codes[:, prows])
            packed_gids = packed_gids.at[0, pos].set(prows.astype(jnp.int32))
        # extend the host-side maps for ALL new rows (merge_candidates
        # dedups, so tail rows in the inverted lists are harmless)
        new_codes = np.asarray(flat._codes[0, start:end])
        rbt2 = dict(rbt)
        for code in np.unique(new_codes):
            add_rows = (start + np.where(new_codes == code)[0]).astype(
                np.int32
            )
            old = rbt2.get(int(code))
            rbt2[int(code)] = (
                add_rows if old is None
                else np.concatenate([old, add_rows]).astype(np.int32)
            )
        self._state = (
            centroids, packed_emb, packed_codes, packed_gids, rbt2,
            np.concatenate([assign, new_assign]),
            np.concatenate([row_to_pos, new_rtp]),
            fill,
        )
        self._tail_rows.extend(tail_new)

    # -- persistence --------------------------------------------------------

    IVF_FILE = "ivf_index.npz"

    def save(self, directory: str) -> None:
        """Persist centroids + the row assignment; packing is recomputed
        on load by the same device scatter (cheap), skipping k-means."""
        import os

        self.flat.save(directory)
        np.savez(
            os.path.join(directory, self.IVF_FILE),
            centroids=np.asarray(self.centroids, np.float32),
            assign=self._assign,
            c_max=self.c_max,
            tile=self.tile,
            nprobe=self.nprobe,
            n_clusters=self.n_clusters,
        )

    @classmethod
    def load(cls, directory: str, flat) -> "IVFIndex":
        import os

        data = np.load(os.path.join(directory, cls.IVF_FILE))
        assign = np.asarray(data["assign"], np.int32)
        if assign.shape[0] > flat.n_valid:
            raise ValueError(
                f"{cls.IVF_FILE} covers {assign.shape[0]} rows but the "
                f"flat index holds only {flat.n_valid} — stale ivf"
            )
        idx = cls.__new__(cls)
        idx.flat = flat
        idx.store = flat.store
        idx.dtype = flat.dtype
        idx.tile = int(data["tile"])
        idx.nprobe = int(data["nprobe"])
        idx.n_clusters = int(data["n_clusters"])
        idx.c_max = int(data["c_max"])
        idx.tiles_per_cluster = idx.c_max // idx.tile
        idx.kmeans_iters = 10
        idx.auto_rebuild_tail_frac = 0.10
        idx.auto_rebuild_growth_frac = 0.50
        # a later (auto-)rebuild re-derives geometry for the grown corpus
        idx._want_clusters = idx._want_cmax = idx._want_nprobe = None
        idx._upsert_lock = threading.Lock()
        idx._state, idx._tail_rows = idx._pack(
            assign, np.asarray(data["centroids"], np.float32)
        )
        idx._built_n = len(assign)
        return idx
