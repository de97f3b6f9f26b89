"""HNSW index tier: native host-side build, batched device-side walk.

The reference's sub-linear search lives in Qdrant's server-side HNSW
(reached via query_points, reference main.py:215-239).  A literal HNSW
walk is branchy, pointer-chasing code — hostile to a systolic/SIMD
machine — so this tier splits the algorithm at the hardware boundary:

- **Build** (host, native/hnsw.cpp): classic hierarchical insertion with
  efConstruction beam + heuristic neighbor selection.  The graph is then
  *flattened for the device*: a fixed-degree level-0 adjacency matrix
  (N, 2M) in HBM and a short list of upper-level entry nodes.  A pure
  NumPy exact-kNN fallback covers environments without g++.

- **Query** (device, this file): batched best-first beam search with a
  fixed step count — compiler-friendly control flow (`lax.scan`), static
  shapes throughout.  Each step expands the best ``frontier`` unexpanded
  beam nodes *per query*, gathers their neighbors' vectors from HBM, and
  merges with `top_k`.  Visited state is a per-query ring of every
  expanded candidate id (width ef + steps*frontier*2M, ~4k) with fused
  compare/any membership — no N-sized buffer and no TPU scatter
  anywhere in the step.  All B queries of a dynamic batch walk the
  graph in one XLA program; there is no host round-trip inside the
  walk.

- **Filters** (ticker/document_type, reference main.py:222-231) are
  *result-side*: traversal ranks by raw similarity so graph connectivity
  is unaffected, while a separate result accumulator masks non-matching
  candidates — the same semantics as Qdrant's filtered search at
  moderate selectivity.

- **Upserts** enter the graph ONLINE when the native builder is live:
  the build retains its handle (native/hnsw_loader.NativeHnswGraph) and
  new rows insert in O(log N) via the same concurrent machinery as the
  build (hnsw.cpp frs_hnsw_add); only the level-0 rows whose neighbor
  lists changed are re-shipped to the device adjacency (dirty-row
  export), and the adjacency is pre-padded to the flat capacity so the
  jitted walk's static ``pad_id`` never changes — no retrace, no fused
  fallback.  This matches Qdrant's online upsert semantics (reference
  ingest.py:171-175).  Loaded-from-disk graphs and the no-native
  fallback keep the old contract: upserts land in a brute-forced tail
  (merged at query time) until ``rebuild()`` folds them in.
"""

from __future__ import annotations

import functools
import os
import threading
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from financial_rag_system_tpu.index.base import SearchMixin
from financial_rag_system_tpu.ops.topk import NEG_INF, masked_topk_xla


# ---------------------------------------------------------------------------
# fallback host build (exact kNN graph) — used when native code is off
# ---------------------------------------------------------------------------


def build_knn_graph(
    vecs: np.ndarray, *, m: int = 16, entries_cap: int = 64, seed: int = 0
) -> tuple[np.ndarray, np.ndarray]:
    """Exact 2M-NN graph + random entry sample.

    O(N^2) — fine for the corpus sizes that run without the native
    builder (tests, small demos).  Adjacency shape matches the native
    export: (N, 2M) int32, -1 padded.
    """
    n = vecs.shape[0]
    w = min(2 * m, max(1, n - 1))
    sims = vecs @ vecs.T
    np.fill_diagonal(sims, -np.inf)
    nbrs = np.argpartition(-sims, kth=w - 1, axis=1)[:, :w]
    row_s = np.take_along_axis(sims, nbrs, axis=1)
    order = np.argsort(-row_s, axis=1)
    adj = np.take_along_axis(nbrs, order, axis=1).astype(np.int32)
    if w < 2 * m:
        adj = np.pad(adj, ((0, 0), (0, 2 * m - w)), constant_values=-1)
    rng = np.random.default_rng(seed)
    ent = rng.choice(n, size=min(entries_cap, n), replace=False)
    return adj, ent.astype(np.int32)


# ---------------------------------------------------------------------------
# device descent over the exported upper levels
# ---------------------------------------------------------------------------


def hier_descend(
    queries: jax.Array,   # (B, D) prepped like the walk's queries
    emb: jax.Array,       # corpus embeddings (shared with the flat tier)
    hi_ids: jax.Array,    # (HC+1,) int32 — global id per hi-local node,
                          #  level-sorted desc; slot HC is a safe-gather pad
    hi_adj: jax.Array,    # (L, HC+1, M) int32 — hi-local adjacency per
                          #  level (index 0 <=> level 1), pad == HC
    hi_n: jax.Array,      # () int32 — live hi-node count (<= HC)
    *,
    beam: int,
    steps: int,
    frontier: int,
    pad_global: int,
) -> jax.Array:
    """Coarse-to-fine routing: beam-walk each upper level top-down; the
    survivors of level l seed level l-1.  Returns (B, beam) GLOBAL ids
    (sentinel slots == ``pad_global``) that seed the level-0 walk.

    Why this exists: the level-0-only walk explores a budget of nodes
    independent of corpus size, so once the corpus dwarfs that budget,
    recall depends on the *entry points* landing near the answer — and a
    fixed entry sample cannot (measured: the 1M-row trained-encoder hard
    eval fell to 8.9% Hit@5 from 89.3% flat; scripts/diag_trained_geometry.py
    shows why: outlier-island targets with no similarity gradient from
    the corpus bulk).  The upper levels are a geometric stack of
    subsamples (|level l| ~ N/m^l), i.e. exactly the HNSW paper's
    long-range routing structure — this restores it on device.  Each
    level is walked with STATIC shapes and a fixed step count
    (lax.scan over the stacked (L, HC+1, M) adjacency, reverse order),
    so the whole descent is one compiled program: no host round trips,
    no per-level retrace.  No visited ring here — upper levels are tiny
    and a revisit only costs a wasted gather, never wrongness.
    """
    b, _d = queries.shape
    hc = hi_ids.shape[0] - 1
    m = hi_adj.shape[2]
    q = queries
    c_w = frontier * m

    def score(ids):  # hi-local ids -> similarity, pad = -inf
        vecs = emb[hi_ids[ids]]
        s = jnp.einsum(
            "bcd,bd->bc", vecs.astype(jnp.float32), q.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return jnp.where(ids == hc, NEG_INF, s)

    # init: the first `beam` hi-local slots hold the highest-level nodes
    # (level-sorted export) — the classic HNSW global entry and its peers
    iota = jnp.arange(beam, dtype=jnp.int32)
    beam_ids = jnp.broadcast_to(
        jnp.where(iota < hi_n, iota, hc)[None, :], (b, beam)
    )
    beam_s = score(beam_ids)

    def level_step(carry, adj_l):
        beam_ids, beam_s = carry
        expanded = beam_ids == hc  # re-expand at every level: new edges

        def step(carry, _):
            beam_ids, beam_s, expanded = carry
            sel = jnp.where(expanded, NEG_INF, beam_s)
            top_s, slot = jax.lax.top_k(sel, frontier)
            src = jnp.take_along_axis(beam_ids, slot, axis=1)
            src = jnp.where(top_s > NEG_INF, src, hc)
            hit = slot[:, :, None] == jnp.arange(beam)[None, None, :]
            expanded = expanded | jnp.any(hit, axis=1)
            cand = adj_l[src].reshape(b, c_w)
            # dedup vs the current beam + within the step (sort/compare —
            # no scatter), so duplicates cannot crowd the beam
            in_beam = jnp.any(
                cand[:, :, None] == beam_ids[:, None, :], axis=2
            )
            cand = jnp.where(in_beam, hc, cand)
            cand = jnp.sort(cand, axis=1)
            dup = jnp.concatenate(
                [jnp.zeros((b, 1), bool), cand[:, 1:] == cand[:, :-1]],
                axis=1,
            )
            cand = jnp.where(dup, hc, cand)
            cs = score(cand)
            all_s = jnp.concatenate([beam_s, cs], axis=1)
            all_i = jnp.concatenate([beam_ids, cand], axis=1)
            all_e = jnp.concatenate([expanded, cand == hc], axis=1)
            beam_s, pos = jax.lax.top_k(all_s, beam)
            beam_ids = jnp.take_along_axis(all_i, pos, axis=1)
            expanded = jnp.take_along_axis(all_e, pos, axis=1)
            return (beam_ids, beam_s, expanded), None

        (beam_ids, beam_s, _), _ = jax.lax.scan(
            step, (beam_ids, beam_s, expanded), None, length=steps
        )
        return (beam_ids, beam_s), None

    # reverse=True: hi_adj[0] is level 1, so iterate top level first
    (beam_ids, _), _ = jax.lax.scan(
        level_step, (beam_ids, beam_s), hi_adj, reverse=True
    )
    return jnp.where(
        beam_ids == hc, jnp.int32(pad_global), hi_ids[beam_ids]
    )


hier_descend_jit = jax.jit(
    hier_descend,
    static_argnames=("beam", "steps", "frontier", "pad_global"),
)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "steps", "frontier", "pad_id",
        "take", "d_beam", "d_steps", "d_frontier",
    ),
)
def hnsw_routed_walk(
    queries: jax.Array,
    query_filter: jax.Array,
    emb: jax.Array,
    codes: jax.Array,
    adj_pad: jax.Array,
    entries: jax.Array,   # (E,) fixed entries
    pool_rows,            # (P,) int32 or None
    hi_ids,               # hierarchy triple or three Nones
    hi_adj,
    hi_n,
    k: int,
    *,
    ef: int,
    steps: int,
    frontier: int,
    pad_id: int,
    take: int = 0,
    d_beam: int = 0,
    d_steps: int = 4,
    d_frontier: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Pool routing + hierarchy descent + level-0 walk as ONE program.

    The staged search path pays a ~33 ms per-dispatch RPC floor on a
    tunneled chip; fusing the three routing stages into one jit keeps
    the staged graph search at a single device round trip (the fused
    serving programs already inline all three — ops/fused_query.py).
    Pass ``pool_rows=None`` / ``hi_ids=None`` (with take/d_beam 0) to
    drop a stage at trace time.
    """
    b = queries.shape[0]
    seed_list = []
    if take > 0 and pool_rows is not None:
        seed_list.append(pool_take(
            queries, emb, pool_rows, take=take, pad_global=pad_id,
        ))
    if d_beam > 0 and hi_ids is not None:
        seed_list.append(hier_descend(
            queries, emb, hi_ids, hi_adj, hi_n,
            beam=d_beam, steps=d_steps, frontier=d_frontier,
            pad_global=pad_id,
        ))
    ent = entries
    if seed_list:
        seed_list.append(
            jnp.broadcast_to(entries[None, :], (b, entries.shape[0]))
        )
        ent = jnp.concatenate(seed_list, axis=1)
    return hnsw_walk(
        queries, query_filter, emb, codes, adj_pad, ent, k,
        ef=ef, steps=steps, frontier=frontier, pad_id=pad_id,
    )


def pack_hier(
    hi_ids: np.ndarray,
    hi_levels: np.ndarray,
    hi_adj: np.ndarray,
    *,
    hc_cap: int,
    l_cap: int,
    m: int,
) -> tuple[jax.Array, jax.Array, int]:
    """Pad the native hierarchy export to STATIC device shapes.

    Returns ``(hi_ids_dev (hc_cap+1,), hi_adj_dev (l_cap, hc_cap+1, m),
    hi_n)``.  Sentinel == hc_cap: pad slots of hi_ids hold 0 (safe
    gather; scores are masked on the hi-local id, not the gathered row)
    and pad adjacency points at the sentinel.  Fixed caps mean online
    inserts re-export the (small) hierarchy into the same shapes — the
    jitted descent never retraces.
    """
    hi_n = len(hi_ids)
    if hi_n > hc_cap or hi_adj.shape[0] > l_cap:
        raise ValueError(
            f"hierarchy ({hi_n} nodes, {hi_adj.shape[0]} levels) exceeds "
            f"caps ({hc_cap}, {l_cap})"
        )
    ids = np.zeros(hc_cap + 1, np.int32)
    ids[:hi_n] = hi_ids
    adj = np.full((l_cap, hc_cap + 1, m), hc_cap, np.int32)
    if hi_n:
        adj[: hi_adj.shape[0], :hi_n, :] = np.where(
            hi_adj < 0, hc_cap, hi_adj
        )
    return jnp.asarray(ids), jnp.asarray(adj), hi_n


def hier_caps(capacity: int, m: int) -> tuple[int, int]:
    """Static (hc_cap, l_cap) for a corpus capacity: expected hi count
    is capacity/m under geometric level sampling; the slack covers
    sampling variance so online inserts virtually never overflow."""
    import math

    mu = capacity / max(2, m)
    hc_cap = int(mu + 6 * math.sqrt(mu + 1)) + 64
    l_cap = int(math.log(max(capacity, 2)) / math.log(max(2, m))) + 2
    return hc_cap, l_cap


# ---------------------------------------------------------------------------
# k-center entry pool: coverage-guaranteed seeds for the walk
# ---------------------------------------------------------------------------
#
# Why this exists (measured, 1M-row trained-encoder hard corpus): HNSW's
# own structure cannot route to tight outlier clusters that receive
# (almost) no in-edges from the corpus bulk — the heuristic neighbor
# selection prunes remote backlinks as the bulk densifies, leaving the
# 224 relevant rows with 35 bulk in-edges out of 33M, and both the
# level-0 walk (3/56 targets found) and the upper-level descent (2/56)
# blind to them.  A greedy k-center (farthest-point) sample has the
# dual guarantee: every corpus row is within the coverage radius of
# some pool row, and the most isolated clusters are picked FIRST.
# Scoring the pool per query (one tiny matmul) and seeding the beam
# with the top pool rows put 48/56 targets in the candidates — the
# exact-retrieval ceiling is 50/56 (scripts/walk_lab.py).
#
# The greedy pass is one matvec per pool row — sequential but trivially
# jittable (fori_loop), HBM-bound, a few seconds at 1M rows on a v5e.


@functools.partial(jax.jit, static_argnames=("pool",))
def kcenter_rows(
    emb: jax.Array,   # (cap, D) corpus embeddings (any dtype)
    n: jax.Array,     # () int32 — live rows
    *,
    pool: int,
) -> tuple[jax.Array, jax.Array]:
    """Greedy farthest-point sample of the live rows.

    Returns ``(rows (pool,) int32, tau ())`` where ``tau`` is the final
    coverage (min over rows of max similarity to the pool) — the online
    insert path uses it to decide when an upserted row opens a region
    the pool does not cover.  If pool > n, the tail repeats rows (the
    walk's seed dedup sentinels them out).
    """
    cap = emb.shape[0]
    iota = jnp.arange(cap, dtype=jnp.int32)
    valid = iota < n

    def sim_to(idx):
        v = emb[idx]
        return jnp.einsum(
            "nd,d->n", emb, v, preferred_element_type=jnp.float32
        )

    first = jnp.int32(0)
    inf = jnp.float32(jnp.inf)
    maxsim = jnp.where(valid & (iota != first), sim_to(first), inf)
    ents0 = jnp.zeros(pool, jnp.int32).at[0].set(first)

    def body(i, carry):
        maxsim, ents = carry
        nxt = jnp.argmin(maxsim).astype(jnp.int32)
        ents = jax.lax.dynamic_update_slice(ents, nxt[None], (i,))
        s = jnp.where(valid & (iota != nxt), sim_to(nxt), inf)
        return jnp.maximum(maxsim, s), ents

    maxsim, ents = jax.lax.fori_loop(1, pool, body, (maxsim, ents0))
    tau = jnp.min(jnp.where(valid, maxsim, inf))
    return ents, tau


def pool_take(
    queries: jax.Array,    # (B, D) prepped like the walk's queries
    emb: jax.Array,
    pool_rows: jax.Array,  # (P,) int32, sentinel == pad_global for spares
    *,
    take: int,
    pad_global: int,
) -> jax.Array:
    """Top-``take`` pool rows per query, (B, take) global ids (sentinel
    slots == ``pad_global``).  One (B, P) matmul over gathered pool
    vectors — the per-query routing step that replaces blind entries."""
    pv = emb[jnp.minimum(pool_rows, pad_global - 1)]  # (P, D) safe gather
    s = jnp.einsum(
        "bd,pd->bp", queries.astype(jnp.float32), pv.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    s = jnp.where(pool_rows[None, :] >= pad_global, NEG_INF, s)
    top_s, idx = jax.lax.top_k(s, take)
    rows = pool_rows[idx]
    return jnp.where(top_s > NEG_INF, rows, jnp.int32(pad_global))


pool_take_jit = jax.jit(
    pool_take, static_argnames=("take", "pad_global")
)


def kcenter_rows_host(vecs: np.ndarray, size: int) -> np.ndarray:
    """NumPy twin of :func:`kcenter_rows` for host-side builds (the
    sharded tier samples each shard's pool while it already holds the
    gathered host copy for the native graph builds)."""
    n = vecs.shape[0]
    size = max(1, min(size, n))
    ents = np.empty(size, np.int32)
    ents[0] = 0
    maxsim = vecs @ vecs[0]
    maxsim[0] = np.inf
    for i in range(1, size):
        nxt = int(np.argmin(maxsim))
        ents[i] = nxt
        np.maximum(maxsim, vecs @ vecs[nxt], out=maxsim)
        maxsim[nxt] = np.inf
    return ents


def pool_size_for(n: int) -> int:
    """Default pool size: enough entries that isolated clusters of a few
    hundred rows get their own representative (measured adequate at
    n/512; clamped for tiny and huge corpora)."""
    return max(64, min(4096, n // 512))


# ---------------------------------------------------------------------------
# device walk
# ---------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("k", "ef", "steps", "frontier", "pad_id")
)
def hnsw_walk(
    queries: jax.Array,       # (B, D) float32
    query_filter: jax.Array,  # (B, 2) int32
    emb: jax.Array,           # (>= pad_id, D) corpus embeddings (shared
                              #  with the flat index — rows past the graph
                              #  are never referenced by adjacency)
    codes: jax.Array,         # (2, >= pad_id) filter codes
    adj_pad: jax.Array,       # (pad_id+1, M0) int32 — pad neighbor == pad_id
    entries: jax.Array,       # (E,) int32 shared, or (B, E) per-query
                              #  seeds (hier_descend output)
    k: int,
    *,
    ef: int,
    steps: int,
    frontier: int,
    pad_id: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched fixed-step beam search. Returns (scores, rows) (B, k).

    ``pad_id`` is the sentinel candidate id (== graph row count).  The
    row it indexes may hold arbitrary data (e.g. a live tail row of the
    shared flat arrays): every score at the sentinel is masked to -inf
    before it can reach the beam or the results, so no pad row copy of
    the corpus is ever materialized.

    Nothing here scales with the corpus size except the HBM gathers
    themselves.  The visited set is a per-query RING of every id that
    ever entered the candidate list — width ef + steps*frontier*M0
    (~4k) — and membership is one fused compare/any on the VPU.  Dense
    (B, N) visited bitmaps are the classic formulation, but TPU scatter
    is serialized enough that the bitmap dominated the walk at the 1M
    tier (~218 of 243 ms/batch-32); the ring is exact (every visited
    node entered as a candidate exactly once) and O(steps^2 * C^2)
    compares total, independent of N.
    """
    b, d = queries.shape
    n = pad_id
    e = entries.shape[-1]
    m0 = adj_pad.shape[1]
    q = queries.astype(jnp.float32)

    def score(ids):  # (B, C) -> (B, C) raw similarity, pad = -inf
        vecs = emb[ids]  # (B, C, D)
        s = jnp.einsum(
            "bcd,bd->bc", vecs.astype(jnp.float32), q,
            preferred_element_type=jnp.float32,
        )
        return jnp.where(ids == n, NEG_INF, s)

    def filtered(ids, s):  # mask by per-query metadata filter
        tick_q, dt_q = query_filter[:, 0:1], query_filter[:, 1:2]
        tick_c = codes[0][ids]  # (B, C)
        dt_c = codes[1][ids]
        ok = ((tick_q == -1) | (tick_q == tick_c)) & (
            (dt_q == -1) | (dt_q == dt_c)
        )
        return jnp.where(ok, s, NEG_INF)

    # --- init: beam/results seeded from the entry nodes -------------------
    assert ef >= e, f"ef={ef} must cover the {e} entry nodes"
    ent = (
        jnp.broadcast_to(entries[None, :], (b, e))
        if entries.ndim == 1
        else entries
    )
    # seed dedup (sort/compare, no scatter): descent seeds can repeat
    # the fixed entries, and a duplicate seed would reach the result
    # accumulator twice
    ent = jnp.sort(ent, axis=1)
    ent_dup = jnp.concatenate(
        [jnp.zeros((b, 1), bool), ent[:, 1:] == ent[:, :-1]], axis=1
    )
    ent = jnp.where(ent_dup, n, ent)
    pad_ids = jnp.full((b, ef - e), n, jnp.int32)
    beam_ids = jnp.concatenate([ent, pad_ids], axis=1)  # (B, EF)
    beam_s = score(beam_ids)
    expanded = beam_ids == n  # pad slots never expand

    # visited ring: beam init occupies the first ef slots; step t's
    # deduped candidates land at ef + t*C.  Unfilled slots hold the
    # sentinel, which only ever matches sentinel candidates.
    c_w = frontier * m0
    ring = jnp.concatenate(
        [beam_ids, jnp.full((b, steps * c_w), n, jnp.int32)], axis=1
    )

    res_s = jnp.full((b, k), NEG_INF)
    res_i = jnp.full((b, k), -1, jnp.int32)
    ent_f = filtered(beam_ids, beam_s)
    cat_s = jnp.concatenate([res_s, ent_f], axis=1)
    cat_i = jnp.concatenate(
        [res_i, jnp.where(ent_f > NEG_INF, beam_ids, -1)], axis=1
    )
    res_s, pos = jax.lax.top_k(cat_s, k)
    res_i = jnp.take_along_axis(cat_i, pos, axis=1)

    def step(carry, t):
        beam_ids, beam_s, expanded, ring, res_s, res_i = carry

        # pick the best `frontier` unexpanded beam nodes per query
        sel = jnp.where(expanded, NEG_INF, beam_s)
        top_s, slot = jax.lax.top_k(sel, frontier)  # (B, F)
        src = jnp.take_along_axis(beam_ids, slot, axis=1)
        src = jnp.where(top_s > NEG_INF, src, n)
        hit = slot[:, :, None] == jnp.arange(ef)[None, None, :]  # (B, F, EF)
        expanded = expanded | jnp.any(hit, axis=1)

        # expand: neighbor gather, ring-membership dedup, score
        cand = adj_pad[src].reshape(b, c_w)
        seen = jnp.any(cand[:, :, None] == ring[:, None, :], axis=2)
        cand = jnp.where(seen, n, cand)
        # within-step dedup (two frontier nodes sharing a neighbor): sort
        # the C-wide candidate list and sentinel out adjacent duplicates.
        # Candidate order is irrelevant downstream — every consumer is a
        # top-k merge.
        cand = jnp.sort(cand, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros((b, 1), bool), cand[:, 1:] == cand[:, :-1]], axis=1
        )
        cand = jnp.where(dup, n, cand)
        ring = jax.lax.dynamic_update_slice(
            ring, cand, (jnp.int32(0), ef + t * c_w)
        )
        cs = score(cand)

        # result accumulation under the metadata filter
        fs = filtered(cand, cs)
        r_cat_s = jnp.concatenate([res_s, fs], axis=1)
        r_cat_i = jnp.concatenate(
            [res_i, jnp.where(fs > NEG_INF, cand, -1)], axis=1
        )
        res_s, pos = jax.lax.top_k(r_cat_s, k)
        res_i = jnp.take_along_axis(r_cat_i, pos, axis=1)

        # beam merge on raw similarity
        b_cat_s = jnp.concatenate([beam_s, cs], axis=1)
        b_cat_i = jnp.concatenate([beam_ids, cand], axis=1)
        b_cat_e = jnp.concatenate(
            [expanded, cand == n], axis=1
        )  # fresh candidates are unexpanded; pads stay expanded
        beam_s, pos = jax.lax.top_k(b_cat_s, ef)
        beam_ids = jnp.take_along_axis(b_cat_i, pos, axis=1)
        expanded = jnp.take_along_axis(b_cat_e, pos, axis=1)

        return (beam_ids, beam_s, expanded, ring, res_s, res_i), None

    carry = (beam_ids, beam_s, expanded, ring, res_s, res_i)
    (beam_ids, beam_s, expanded, ring, res_s, res_i), _ = jax.lax.scan(
        step, carry, jnp.arange(steps)
    )
    return res_s, res_i


# ---------------------------------------------------------------------------
# index tier
# ---------------------------------------------------------------------------


class HNSWIndex(SearchMixin):
    """Graph tier built from (and sharing the store of) a FlatIndex."""

    def __init__(
        self,
        flat,
        *,
        m: int = 16,
        ef_construction: int = 100,
        ef: int = 64,
        frontier: int = 8,
        steps: int | None = None,
        entries_cap: int = 32,
        seed: int = 0,
        graph: tuple[np.ndarray, np.ndarray] | None = None,
        hier: tuple[np.ndarray, np.ndarray, np.ndarray] | None = None,
        descend_beam: int = 16,
        descend_steps: int = 4,
        descend_frontier: int = 4,
        entry_pool: int | None = None,
        pool_seeds: int = 32,
        pool: tuple[np.ndarray, float] | None = None,
    ):
        self.flat = flat
        self.store = flat.store
        self.m = m
        self.ef_construction = ef_construction
        self.ef = ef
        self.frontier = frontier
        # upper-level descent (long-range routing): survivors of the
        # coarse walk seed the level-0 walk per query — required for
        # recall once the corpus dwarfs the walk's exploration budget
        # (see hier_descend docstring; measured at the 1M trained tier)
        self.descend_beam = descend_beam
        self.descend_steps = descend_steps
        self.descend_frontier = descend_frontier
        # k-center entry pool (coverage-guaranteed seeds): the decisive
        # routing aid for outlier-island targets — see kcenter_rows
        self.entry_pool = entry_pool
        self.pool_seeds = pool_seeds
        self._pool_init = pool
        # defaults measured on a v5e with the ring-visited walk
        # (scripts/tpu_probes.py --probe hnsw, clustered rows, m=16
        # efc=100 ef=64, device ms/batch-32):
        #   131k: f8/s16 -> recall@15 0.95 @ ~3.5 ms   (f4/s32: 0.95 @ 8.0)
        #   1M:   f8/s16 -> 0.85 @ ~5.7 ms; saturates at 0.92 regardless
        #         of budget — the m=16/efc=100 graph is the 1M ceiling.
        #         A m=24/efc=200 build lifts f8/s16 to 0.956 @ ~5.7 ms
        #         (build cost ~2.7x: 96 vs 35 min at 1M, single-threaded).
        # Wider frontiers buy parallel gathers per sequential step, so
        # f8 matches f4's recall in half the steps at lower latency.
        self.steps = steps if steps is not None else max(8, 2 * ef // frontier)
        self.entries_cap = entries_cap
        self.seed = seed
        self._tail_rows: list[int] = []
        # live native handle (incremental insert); None => tail contract
        self._native = None
        self._native_lock = threading.Lock()
        assert flat.n_valid > 0, "build the flat index first"
        self._graph_state = self._build(graph, hier)

    # -- build ----------------------------------------------------------

    # the exact-kNN fallback is O(N^2) memory; refuse rather than OOM the
    # serving process when the native builder is unavailable at scale
    MAX_FALLBACK_ROWS = 200_000

    def _publish(self, state, native):
        """Atomically publish a freshly built graph: swap the native
        handle, graph snapshot, and tail list in ONE ``_native_lock``
        critical section.  The old handle is captured here (not at the
        top of ``_build``), so two concurrent rebuilds can never both
        capture-and-close the same handle (frs_hnsw_destroy has no
        liveness check), and ``_online_insert`` — which re-reads both
        ``_native`` and ``_graph_state`` under this lock — can never see
        a mixed old-snapshot/new-handle pair (ADVICE r3)."""
        with self._native_lock:
            old_native, self._native = self._native, native
            self._graph_state = state
            self._tail_rows = list(range(state[5], self.flat.n_valid))
            if old_native is not None and old_native is not native:
                old_native.close()
        return state

    def _build(self, graph=None, hier=None) -> None:
        flat = self.flat
        if graph is None:
            n = flat.n_valid
            vecs = np.asarray(flat._emb[:n], np.float32)
            if getattr(flat, "quantized", False):
                vecs = vecs / 127.0
            from financial_rag_system_tpu.native.hnsw_loader import (
                build_hnsw_graph_handle,
            )

            native = build_hnsw_graph_handle(
                vecs, m=self.m, ef_construction=self.ef_construction,
                seed=self.seed,
            )
            self.native_built = native is not None
            if native is not None:
                return self._publish(self._native_state(native, n), native)
            if n > self.MAX_FALLBACK_ROWS:
                raise RuntimeError(
                    f"native HNSW builder unavailable and the exact-kNN "
                    f"fallback is O(N^2) — refusing at {n} rows "
                    f"(> {self.MAX_FALLBACK_ROWS}); install g++ or use "
                    f"the IVF tier"
                )
            graph = build_knn_graph(
                vecs, m=self.m, entries_cap=self.entries_cap,
                seed=self.seed,
            )
        else:
            # loaded graph: it covers the first adj.shape[0] rows; any
            # rows upserted after the save become the brute-forced tail
            # (_publish swaps/clears the native handle at the end)
            self.native_built = None
            n = graph[0].shape[0]
        adj, entries = graph
        # the walk reads the flat index's HBM arrays directly — sentinel
        # id n is score-masked, so no padded corpus copy is materialized
        adj_np = np.where(adj < 0, n, adj).astype(np.int32)
        adj_pad = jnp.asarray(
            np.concatenate([adj_np, np.full((1, adj_np.shape[1]), n, np.int32)])
        )
        pool_state = self._build_pool(n, n, self._pool_init)
        self._pool_init = None
        seeds = self.descend_beam if hier is not None else 0
        ef = max(
            self.ef, int(entries.shape[0]) + seeds + pool_state[3]
        )
        self._host_graph = (np.asarray(adj, np.int32), np.asarray(entries))
        hier_dev = None
        if hier is not None:
            # loaded hierarchy: exact-size pack (no online inserts on a
            # loaded graph — upserts tail until rebuild(), so no slack)
            hi_ids, hi_levels, hi_adj = hier
            hier_dev = pack_hier(
                hi_ids, hi_levels, hi_adj,
                hc_cap=max(len(hi_ids), 1),
                l_cap=max(hi_adj.shape[0], 1), m=self.m,
            )
        from financial_rag_system_tpu.index.base import build_ticker_lists

        # inverted lists per ticker code over the graph rows: highly
        # selective filters bypass the walk (see search_device) — the
        # standard fix for filtered-ANN recall collapse at low selectivity
        rows_by_ticker = build_ticker_lists(flat, n)
        # one-tuple snapshot: concurrent searches read a consistent
        # (adjacency, entries, sentinel, ef, inverted-lists, row-count,
        # hierarchy, entry-pool) state
        return self._publish(
            (
                adj_pad, jnp.asarray(entries, jnp.int32), n, ef,
                rows_by_ticker, n, hier_dev, pool_state,
            ),
            None,
        )

    def _build_pool(self, n: int, pad_id: int, pool_init=None):
        """K-center entry pool snapshot: ``(rows_dev (P,), tau, live,
        take)``.  ``P`` includes spare sentinel slots so the online
        insert path can append uncovered rows without a shape change;
        ``take`` is the per-query seed count (static for the jit)."""
        size = (
            self.entry_pool if self.entry_pool is not None
            else pool_size_for(n)
        )
        size = max(1, min(size, n))
        if pool_init is not None:
            rows = np.asarray(pool_init[0], np.int32)
            tau = float(pool_init[1])
        else:
            rows_dev, tau_dev = kcenter_rows(
                self.flat._emb, jnp.int32(n), pool=size
            )
            rows = np.asarray(rows_dev)
            # pool > distinct rows: drop repeats, keep first occurrence
            rows = rows[np.sort(np.unique(rows, return_index=True)[1])]
            tau = float(tau_dev)
        live = len(rows)
        p_cap = live + max(64, live // 4)
        full = np.full(p_cap, pad_id, np.int32)
        full[:live] = rows
        self._host_pool = (rows.copy(), tau)
        take = min(self.pool_seeds, live)
        return (jnp.asarray(full), tau, live, take)

    def _native_state(self, native, n: int):
        """Snapshot for a LIVE native graph: the device adjacency is
        pre-padded to the flat capacity so the sentinel (== capacity)
        and the array shape stay constant across incremental inserts —
        the jitted walk and the fused hnsw program never retrace or fall
        back on an upsert.  Rows in [n, capacity) are all-sentinel and
        unreachable until an insert patches them."""
        flat = self.flat
        cap = flat.capacity
        w = 2 * self.m
        adj_np = np.full((cap + 1, w), cap, np.int32)
        full = native.adjacency()  # (n, w), -1 padded
        adj_np[:n] = np.where(full < 0, cap, full)
        adj_pad = jnp.asarray(adj_np)
        ent = native.entries(self.entries_cap)
        # fixed-width entries: sentinel-padded so re-exports after inserts
        # keep the device shape static (sentinel seeds score -inf and
        # never expand)
        ent_np = np.full(self.entries_cap, cap, np.int32)
        ent_np[: len(ent)] = ent
        pool_state = self._build_pool(n, cap, self._pool_init)
        self._pool_init = None
        ef = max(
            self.ef,
            self.entries_cap + self.descend_beam + pool_state[3],
        )
        self._host_graph = (np.asarray(full, np.int32), np.asarray(ent))
        # upper-level export at CAPACITY-derived caps: online inserts
        # re-pack the (small) refreshed hierarchy into these same static
        # shapes, so the jitted descent never retraces on an upsert
        hc_cap, l_cap = hier_caps(cap, self.m)
        hier_dev = pack_hier(*native.hierarchy(), hc_cap=hc_cap,
                             l_cap=l_cap, m=self.m)
        from financial_rag_system_tpu.index.base import build_ticker_lists

        rows_by_ticker = build_ticker_lists(flat, n)
        return (
            adj_pad, jnp.asarray(ent_np), cap, ef, rows_by_ticker, n,
            hier_dev, pool_state,
        )

    # attribute views over the atomic snapshot
    @property
    def adj_pad(self):
        return self._graph_state[0]

    @property
    def entries(self):
        return self._graph_state[1]

    @property
    def n_graph(self) -> int:
        return self._graph_state[5]

    def rebuild(self) -> None:
        """Fold tail/new rows into a fresh graph.

        The old graph + tail keep serving while the build runs (it can
        take minutes at scale, off the GIL in the native library); the
        handle/snapshot/tail swap is one ``_native_lock`` critical
        section (:meth:`_publish`), and rows upserted *during* the build
        land in the fresh tail.  With the live native handle rebuild()
        is optional compaction — online inserts keep the graph current —
        but still re-runs heuristic selection from scratch.
        """
        self._build()

    @property
    def n_valid(self) -> int:
        return self.flat.n_valid

    # -- query ----------------------------------------------------------

    # a filter matching at most this many graph rows is scored exactly
    # (gather + masked top-k over its inverted list) instead of trusting
    # the walk: a result-side-filtered walk loses recall once matching
    # rows are a small fraction of the corpus (Hit@5 measured at 20% on a
    # 12%-selective ticker before this path existed)
    SELECTIVE_LIMIT = 8192

    def search_device(
        self,
        query_vecs: jax.Array,
        query_filter: jax.Array,
        k: int,
        *,
        host_codes=None,
    ) -> tuple[jax.Array, jax.Array]:
        state = self._graph_state  # one atomic read
        adj_pad, entries, pad_id, ef, rows_by_ticker, _n, hier, pool = state
        # quantized corpora need quantized queries so walk scores and the
        # tail's scores share one scale (cos * 127^2) and merge correctly
        qp = (
            self.flat.prep_queries(query_vecs)
            if getattr(self.flat, "quantized", False)
            else query_vecs.astype(jnp.float32)
        )
        # pool routing (coverage-guaranteed seeds), hierarchy descent
        # (long-range routing), and the level-0 walk run as ONE device
        # program — a tunneled chip pays a per-dispatch RPC floor, so
        # the staged path must not multiply it
        hi_ids_dev = hi_adj_dev = hi_n = None
        if hier is not None:
            hi_ids_dev, hi_adj_dev, hi_n = hier
            hi_n = jnp.int32(hi_n)
        s, i = hnsw_routed_walk(
            qp,
            query_filter,
            self.flat._emb,   # live arrays: upserted tail rows are
            self.flat._codes,  # unreachable from the frozen adjacency
            adj_pad,
            entries,
            pool[0] if pool is not None else None,
            hi_ids_dev, hi_adj_dev, hi_n,
            k,
            ef=ef,
            steps=self.steps,
            frontier=self.frontier,
            pad_id=pad_id,
            take=pool[3] if pool is not None else 0,
            d_beam=self.descend_beam if hier is not None else 0,
            d_steps=self.descend_steps,
            d_frontier=self.descend_frontier,
        )
        from financial_rag_system_tpu.index.base import (
            merge_candidates,
            score_rows,
            selective_rows,
        )

        extras = []
        # exact path for selective filters: union of the batch's small
        # inverted lists, one gather + masked top-k, merged with the walk
        rows = selective_rows(rows_by_ticker, host_codes, self.SELECTIVE_LIMIT)
        if rows is not None:
            extras.append(score_rows(self.flat, rows, qp, query_filter, k))
        if self._tail_rows:
            extras.append(
                score_rows(
                    self.flat, np.asarray(self._tail_rows), qp,
                    query_filter, k,
                )
            )
        return merge_candidates(s, i, extras, k)

    # -- upserts: online insert with a live native graph, else the tail --

    def upsert(self, ids, vectors, texts, payloads) -> int:
        start = self.flat.n_valid
        added = self.flat.upsert(ids, vectors, texts, payloads)
        end = self.flat.n_valid
        if end == start:
            # pure re-upserts: flat arrays updated in place; the walk
            # reads them live, so results are fresh immediately
            return added
        if self._online_insert(start, end):
            return added
        self._tail_rows.extend(range(start, end))
        return added

    def _online_insert(self, start: int, end: int) -> bool:
        """Insert rows [start, end) into the live native graph and patch
        ONLY the changed device adjacency rows.  False => caller tails.

        Eligibility: a live handle whose node count equals ``start``
        (ids must stay aligned with flat rows) and a flat capacity that
        still matches the snapshot's sentinel (a capacity-growing upsert
        would alias the sentinel with a real row — those rows tail until
        rebuild()).
        """
        if self._native is None:  # cheap pre-check; authoritative read below
            return False
        with self._native_lock:
            # re-read under the lock: a concurrent rebuild() may have
            # swapped (and destroyed) the handle after the pre-check
            native = self._native
            if native is None:
                return False
            state = self._graph_state
            (adj_pad, entries_dev, pad_id, ef, rbt, n_graph, hier,
             pool) = state
            if self._tail_rows or n_graph != start or end > pad_id:
                return False
            if self.flat.capacity != pad_id:
                return False
            if native.size != start:
                return False
            vecs = np.asarray(self.flat._emb[start:end], np.float32)
            if getattr(self.flat, "quantized", False):
                vecs = vecs / 127.0
            native.add(vecs)
            rows, adj_rows = native.drain_dirty()
            ent = native.entries(self.entries_cap)
            # patch the pre-padded device adjacency in place (functional
            # update: concurrent searches keep their snapshot)
            adj_new = adj_pad.at[jnp.asarray(rows)].set(
                jnp.asarray(np.where(adj_rows < 0, pad_id, adj_rows))
            )
            ent_np = np.full(self.entries_cap, pad_id, np.int32)
            ent_np[: len(ent)] = ent
            # refresh the upper-level routing: the hierarchy is ~n/m
            # nodes, so a wholesale re-export + re-pack into the SAME
            # static shapes is cheap and keeps the descent current.  On
            # the (statistically negligible) cap overflow, keep the old
            # hierarchy: new rows stay reachable through the patched
            # level-0 adjacency; only their upper-level shortcuts lag
            # until rebuild().
            if hier is not None:
                hc_cap = hier[0].shape[0] - 1
                l_cap = hier[1].shape[0]
                try:
                    hier = pack_hier(
                        *native.hierarchy(), hc_cap=hc_cap, l_cap=l_cap,
                        m=self.m,
                    )
                except ValueError:
                    pass
            # pool coverage maintenance: an upserted row less similar to
            # every pool row than the build's coverage radius opens a
            # region the walk cannot route to — append it to a spare
            # sentinel slot (functional update, static shape)
            if pool is not None:
                pool_dev, tau, live, take = pool
                host_rows, _ = self._host_pool
                # raw-storage space on BOTH sides: tau came from
                # kcenter_rows over flat._emb (int8 scale included when
                # quantized), so coverage must compare like with like
                pv = np.asarray(self.flat._emb[host_rows], np.float32)
                nv = np.asarray(self.flat._emb[start:end], np.float32)
                cover = (nv @ pv.T).max(axis=1) if len(host_rows) else (
                    np.full(len(nv), -np.inf)
                )
                uncovered = np.where(cover < tau)[0]
                p_cap = int(pool_dev.shape[0])
                for off in uncovered:
                    if live >= p_cap:
                        break  # coverage degrades gracefully; rebuild()
                    pool_dev = pool_dev.at[live].set(
                        jnp.int32(start + int(off))
                    )
                    host_rows = np.append(
                        host_rows, np.int32(start + int(off))
                    )
                    live += 1
                self._host_pool = (host_rows, tau)
                pool = (pool_dev, tau, live, take)
            # extend the inverted ticker lists with the new rows
            new_codes = np.asarray(self.flat._codes[0, start:end])
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
            self._graph_state = (
                adj_new, jnp.asarray(ent_np), pad_id, ef, rbt2, end, hier,
                pool,
            )
        return True

    # -- persistence -----------------------------------------------------

    GRAPH_FILE = "hnsw_graph.npz"

    def save(self, directory: str) -> None:
        self.flat.save(directory)
        extra = {}
        # the host copy from build time goes stale under online inserts:
        # export the live graph (+ hierarchy).  Handle read + use under
        # _native_lock — a concurrent rebuild() swap/close between an
        # unlocked check and the native calls would use freed memory.
        with self._native_lock:
            native = self._native
            if native is not None:
                adj = native.adjacency()
                entries = native.entries(self.entries_cap)
                hi_ids, hi_levels, hi_adj = native.hierarchy()
                extra = dict(
                    hi_ids=hi_ids, hi_levels=hi_levels, hi_adj=hi_adj
                )
        if not extra:
            adj, entries = self._host_graph
        pool_rows, pool_tau = self._host_pool
        np.savez(
            os.path.join(directory, self.GRAPH_FILE),
            adj=adj, entries=entries, m=self.m, n_graph=self.n_graph,
            pool_rows=pool_rows, pool_tau=pool_tau,
            **extra,
        )

    @classmethod
    def load(cls, directory: str, flat, **kwargs) -> "HNSWIndex":
        data = np.load(os.path.join(directory, cls.GRAPH_FILE))
        n_graph = int(data["adj"].shape[0])
        if n_graph > flat.n_valid:
            # the graph file is stale relative to the flat index it sits
            # next to (saved under a different corpus): serving it would
            # walk rows that no longer exist
            raise ValueError(
                f"{cls.GRAPH_FILE} covers {n_graph} rows but the flat "
                f"index holds only {flat.n_valid} — stale graph"
            )
        hier = None
        if "hi_ids" in data.files:
            hier = (data["hi_ids"], data["hi_levels"], data["hi_adj"])
        pool = None
        if "pool_rows" in data.files:
            pool = (data["pool_rows"], float(data["pool_tau"]))
        idx = cls(
            flat, m=int(data["m"]),
            graph=(data["adj"], data["entries"]), hier=hier, pool=pool,
            **kwargs,
        )
        # every row past the graph build point is tail, including rows
        # upserted into the flat index after this graph was saved
        idx._tail_rows = list(range(idx.n_graph, flat.n_valid))
        return idx
