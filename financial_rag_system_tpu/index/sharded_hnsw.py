"""Mesh-sharded HNSW: one graph per corpus shard, walked in parallel.

The last cell of the tier matrix (flat / IVF / HNSW) x (single-chip /
mesh-sharded): corpus rows block-shard over the ``corpus`` mesh axis
exactly as in index/sharded.py, and each device walks ITS OWN
independently-built HNSW graph over its local rows — then the per-shard
(B, k) partials ``all_gather`` over ICI and every device computes the
identical replicated merge.  Replaces: Qdrant's single-server HNSW
(reference main.py:215-239) at corpus sizes one chip cannot hold.

Why per-shard graphs rather than one global graph walked across chips:
a graph walk is a serial frontier expansion — a global graph would put a
cross-chip collective inside every expansion step (neighbors live on
other shards), turning ICI latency into a per-step cost.  Per-shard
graphs keep every gather HBM-local; the single all-gather at the end
moves only (B, k) floats.  Recall composes cleanly: each shard returns
its local top-k, and the union of per-shard exact top-k always contains
the global top-k, so the only recall loss is each walk's own (same as
the single-chip tier at shard size — *smaller* graphs walk better).

Shard-local node ids double as block-offset global rows
(global = shard * per_shard + local), so no id-translation tables exist.
Build runs on the host over the gathered corpus (native/hnsw.cpp per
shard); adjacency ships as one (S, per_shard+1, 2M) int32 stack whose
sharding places each graph next to its rows.  The sentinel row per
shard (id == per_shard) is score-masked inside the walk — see
index/hnsw.py ``hnsw_walk``, which this tier reuses unchanged.

Like the other tiers: post-build upserts land in a brute-forced tail,
selective metadata filters are scored exactly via inverted lists, and
``rebuild()`` folds the tail into fresh graphs with a one-tuple snapshot
swap.  If the underlying ShardedFlatIndex *grows* (capacity change ⇒
block geometry change ⇒ node-id/row mapping invalid), search falls back
to the exact sharded flat scan until ``rebuild()`` — degraded latency,
never wrong results.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from financial_rag_system_tpu.index.base import SearchMixin
from financial_rag_system_tpu.index.hnsw import build_knn_graph, hnsw_walk
from financial_rag_system_tpu.parallel.mesh import AXIS_CORPUS


def make_sharded_walk(
    mesh: Mesh, *, k: int, ef: int, steps: int, frontier: int,
    per_shard: int, pool_take: int = 0,
):
    """Jitted shard_map walk: replicated queries, per-shard graphs.

    fn(queries (B,D) repl, qf (B,2) repl, emb (S*P, D) sharded,
       codes (2, S*P) sharded, adj (S, P+1, 2M) sharded,
       entries (S, E) sharded, pool (S, P') sharded) ->
    (B, k) scores / global ids, replicated.

    ``pool_take`` > 0 seeds each shard's walk with its own k-center
    entry-pool rows scored per query (index/hnsw.py ``pool_take`` — the
    outlier-island routing fix), all HBM-local: the pool matmul runs on
    each shard against its own pool, no collective added.
    """
    from financial_rag_system_tpu.index.hnsw import pool_take as pool_take_fn

    def local_fn(queries, qf, emb, codes, adj, entries, pool):
        ent = entries[0]
        if pool_take > 0:
            seeds = pool_take_fn(
                queries, emb, pool[0], take=pool_take,
                pad_global=per_shard,
            )
            ent = jnp.concatenate(
                [seeds, jnp.broadcast_to(
                    ent[None, :], (seeds.shape[0], ent.shape[0]))],
                axis=1,
            )
        s, i = hnsw_walk(
            queries, qf, emb, codes, adj[0], ent, k,
            ef=ef, steps=steps, frontier=frontier, pad_id=per_shard,
        )
        sid = jax.lax.axis_index(AXIS_CORPUS)
        gi = jnp.where(i >= 0, i + sid * per_shard, -1)
        all_s = jax.lax.all_gather(s, AXIS_CORPUS, axis=1, tiled=True)
        all_i = jax.lax.all_gather(gi, AXIS_CORPUS, axis=1, tiled=True)
        ms, mpos = jax.lax.top_k(all_s, k)
        return ms, jnp.take_along_axis(all_i, mpos, axis=1).astype(jnp.int32)

    fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(AXIS_CORPUS, None), P(None, AXIS_CORPUS),
            P(AXIS_CORPUS, None, None), P(AXIS_CORPUS, None),
            P(AXIS_CORPUS, None),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedHNSWIndex(SearchMixin):
    """Graph tier over a ShardedFlatIndex (shares its store and mesh)."""

    # the exact-kNN fallback build is O(N^2) per shard
    MAX_FALLBACK_ROWS = 200_000

    def __init__(
        self,
        sharded_flat,
        *,
        m: int = 16,
        ef_construction: int = 100,
        ef: int = 64,
        frontier: int = 8,
        steps: int | None = None,
        entries_cap: int = 32,
        seed: int = 0,
        graphs: tuple[np.ndarray, np.ndarray] | None = None,
        pools: np.ndarray | None = None,
        pool_seeds: int = 32,
    ):
        self.flat = sharded_flat
        self.mesh: Mesh = sharded_flat.mesh
        self.store = sharded_flat.store
        self.n_shards = sharded_flat.n_shards
        self.m = m
        self.ef_construction = ef_construction
        self.ef = ef
        self.frontier = frontier
        # same measured default as the single-chip tier (index/hnsw.py)
        self.steps = steps if steps is not None else max(8, 2 * ef // frontier)
        self.entries_cap = entries_cap
        self.seed = seed
        self.pool_seeds = pool_seeds
        self._pools_init = pools
        self._walk_cache: dict[tuple[int, int], Any] = {}
        self._tail_rows: list[int] = []
        assert sharded_flat.n_valid > 0, "populate the sharded index first"
        self._graph_state = self._build(graphs)

    # -- build ------------------------------------------------------------

    def _build(self, graphs=None):
        """One-tuple snapshot: (adj_dev, entries_dev, per_shard, n_graph,
        built_capacity, rows_by_ticker) — read once per search so a
        concurrent rebuild can never mix old node ids with new geometry."""
        flat = self.flat
        n = flat.n_valid
        capacity = flat.capacity
        per_shard = capacity // self.n_shards
        m0 = 2 * self.m
        e_cap = self.entries_cap

        from financial_rag_system_tpu.index.hnsw import (
            kcenter_rows_host,
            pool_size_for,
        )

        pool_size = pool_size_for(per_shard)
        pool_stack = None
        if graphs is None:
            # host copy of the corpus for the native builder (gathers
            # cross-process when the mesh spans hosts)
            emb_host = np.asarray(flat._host_copy(flat._emb), np.float32)
            if getattr(flat, "quantized", False):
                emb_host = emb_host / 127.0
            adj_stack = np.full(
                (self.n_shards, per_shard + 1, m0), per_shard, np.int32
            )
            ent_stack = np.full((self.n_shards, e_cap), per_shard, np.int32)
            pool_stack = np.full(
                (self.n_shards, pool_size), per_shard, np.int32
            )
            from financial_rag_system_tpu.native.hnsw_loader import (
                build_hnsw_graph,
            )

            for s in range(self.n_shards):
                local_n = min(max(n - s * per_shard, 0), per_shard)
                if local_n == 0:
                    continue
                vecs = emb_host[s * per_shard : s * per_shard + local_n]
                graph = build_hnsw_graph(
                    vecs, m=self.m, ef_construction=self.ef_construction,
                    seed=self.seed + s, entries_cap=e_cap,
                )
                if graph is None:
                    if local_n > self.MAX_FALLBACK_ROWS:
                        raise RuntimeError(
                            f"native HNSW builder unavailable and the "
                            f"exact-kNN fallback is O(N^2) — refusing at "
                            f"{local_n} rows/shard; use the sharded-ivf tier"
                        )
                    graph = build_knn_graph(
                        vecs, m=self.m, entries_cap=e_cap,
                        seed=self.seed + s,
                    )
                adj, entries = graph
                w = min(adj.shape[1], m0)
                adj_stack[s, :local_n, :w] = np.where(
                    adj[:, :w] < 0, per_shard, adj[:, :w]
                )
                ent_stack[s, : entries.shape[0]] = entries
                # per-shard k-center entry pool (shard-local rows): the
                # outlier-island routing fix, per graph (index/hnsw.py)
                kc = kcenter_rows_host(vecs, pool_size)
                pool_stack[s, : len(kc)] = kc
        else:
            adj_stack, ent_stack = graphs
            if adj_stack.shape[1] != per_shard + 1:
                raise ValueError(
                    f"graph stack covers {adj_stack.shape[1] - 1} rows/shard "
                    f"but the flat index blocks at {per_shard} — mesh or "
                    f"capacity changed since save; rebuild()"
                )
            if self._pools_init is not None and (
                self._pools_init.shape[0] == self.n_shards
            ):
                pool_stack = np.asarray(self._pools_init, np.int32)
        if pool_stack is None:
            # loaded stack without pools (pre-pool save): resample from
            # the host corpus copy — cheap next to the graph builds
            emb_host = np.asarray(flat._host_copy(flat._emb), np.float32)
            if getattr(flat, "quantized", False):
                emb_host = emb_host / 127.0
            pool_stack = np.full(
                (self.n_shards, pool_size), per_shard, np.int32
            )
            for s in range(self.n_shards):
                local_n = min(max(n - s * per_shard, 0), per_shard)
                if local_n == 0:
                    continue
                kc = kcenter_rows_host(
                    emb_host[s * per_shard : s * per_shard + local_n],
                    pool_size,
                )
                pool_stack[s, : len(kc)] = kc

        self._host_graphs = (adj_stack, ent_stack)
        self._host_pools = pool_stack
        # host_to_global, not device_put: the graph stack is host data and
        # identical on every process (lockstep build/load), so skip
        # device_put's assert_equal allgather of the full adjacency
        # (index/sharded.py device_full rationale)
        from financial_rag_system_tpu.index.sharded import host_to_global

        adj_dev = host_to_global(
            NamedSharding(self.mesh, P(AXIS_CORPUS, None, None)), adj_stack
        )
        ent_dev = host_to_global(
            NamedSharding(self.mesh, P(AXIS_CORPUS, None)), ent_stack
        )
        pool_dev = host_to_global(
            NamedSharding(self.mesh, P(AXIS_CORPUS, None)), pool_stack
        )
        pool_take = min(self.pool_seeds, pool_size)
        from financial_rag_system_tpu.index.base import build_ticker_lists

        rows_by_ticker = build_ticker_lists(flat, n)
        return (
            adj_dev, ent_dev, per_shard, n, capacity, rows_by_ticker,
            pool_dev, pool_take,
        )

    @property
    def n_graph(self) -> int:
        return self._graph_state[3]

    @property
    def n_valid(self) -> int:
        return self.flat.n_valid

    def rebuild(self) -> None:
        """Old graphs serve during the build; one-tuple swap at the end."""
        state = self._build()
        new_tail = list(range(state[3], self.flat.n_valid))
        self._graph_state, self._tail_rows = state, new_tail

    # -- query ------------------------------------------------------------

    SELECTIVE_LIMIT = 8192

    def search_device(
        self, query_vecs: jax.Array, query_filter: jax.Array, k: int,
        *, host_codes=None,
    ) -> tuple[jax.Array, jax.Array]:
        from financial_rag_system_tpu.index.base import (
            merge_candidates,
            score_rows,
            selective_rows,
        )

        state = self._graph_state  # one atomic read
        (adj_dev, ent_dev, per_shard, n_graph, built_cap, rbt,
         pool_dev, pool_take) = state
        if self.flat.capacity != built_cap:
            # the flat index grew: block geometry changed, so graph node
            # ids no longer map to rows.  Exact sharded scan until
            # rebuild() — slower, never wrong.
            return self.flat.search_device(
                query_vecs, query_filter, k, host_codes=host_codes
            )
        qp = (
            self.flat.prep_queries(query_vecs)
            if getattr(self.flat, "quantized", False)
            else query_vecs.astype(jnp.float32)
        )
        # keyed by (k, per_shard, pool_take): make_sharded_walk bakes
        # per_shard in as a Python constant (global id stride AND the pad
        # sentinel), so a rebuild() after a capacity-growing upsert must
        # not reuse a program traced for the old geometry — retrace would
        # not fire because the array shapes can coincide.
        fn = self._walk_cache.get((k, per_shard, pool_take))
        if fn is None:
            fn = make_sharded_walk(
                self.mesh, k=k,
                ef=max(self.ef, self.entries_cap + pool_take),
                steps=self.steps, frontier=self.frontier,
                per_shard=per_shard, pool_take=pool_take,
            )
            self._walk_cache[(k, per_shard, pool_take)] = fn
        s, i = fn(
            qp, query_filter, self.flat._emb, self.flat._codes,
            adj_dev, ent_dev, pool_dev,
        )
        extras = []
        rows = selective_rows(rbt, host_codes, self.SELECTIVE_LIMIT)
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

    # -- upserts go to the tail until rebuild -------------------------------

    def upsert(self, ids, vectors, texts, payloads) -> int:
        # re-upserted existing ids update the flat arrays in place and the
        # walk reads those arrays live, so they are fresh immediately —
        # only NEW rows (unreachable from the frozen adjacency) need the
        # tail.  A capacity-growing upsert invalidates the graphs; the
        # search path detects that via built_capacity and falls back.
        start = self.flat.n_valid
        added = self.flat.upsert(ids, vectors, texts, payloads)
        self._tail_rows.extend(range(start, self.flat.n_valid))
        return added

    # -- persistence --------------------------------------------------------

    GRAPH_FILE = "sharded_hnsw_graph.npz"

    def save(self, directory: str) -> None:
        self.flat.save(directory)  # gathers cross-process; process 0 writes
        if jax.process_index() != 0:
            return
        adj_stack, ent_stack = self._host_graphs
        np.savez(
            os.path.join(directory, self.GRAPH_FILE),
            adj=adj_stack, entries=ent_stack, m=self.m,
            n_graph=self.n_graph, pools=self._host_pools,
        )

    @classmethod
    def load(cls, directory: str, sharded_flat, **kwargs) -> "ShardedHNSWIndex":
        data = np.load(os.path.join(directory, cls.GRAPH_FILE))
        n_graph = int(data["n_graph"])
        if n_graph > sharded_flat.n_valid:
            raise ValueError(
                f"{cls.GRAPH_FILE} covers {n_graph} rows but the flat index "
                f"holds only {sharded_flat.n_valid} — stale graph"
            )
        idx = cls(
            sharded_flat, m=int(data["m"]),
            graphs=(data["adj"], data["entries"]),
            pools=data["pools"] if "pools" in data.files else None,
            **kwargs,
        )
        # _build trusted the stack's geometry; pin the row count it covers
        state = idx._graph_state
        idx._graph_state = state[:3] + (n_graph,) + state[4:]
        idx._tail_rows = list(range(n_graph, sharded_flat.n_valid))
        return idx
