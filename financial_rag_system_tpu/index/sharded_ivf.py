"""Mesh-sharded IVF: sub-linear probing per shard + all-gather merge.

Composition of the two scale mechanisms (BASELINE.json config 5): corpus
rows shard over the ``corpus`` mesh axis (index/sharded.py) AND each
shard probes only its top-nprobe clusters (index/ivf.py) instead of
streaming its whole shard.  Together: 10M+ chunks across a pod slice
with per-query work proportional to nprobe, not corpus size.

Design (TPU-first):

- **One global codebook.** Centroids come from spherical k-means over a
  corpus-wide sample and are replicated — so every shard probes the
  *same* cluster ids for a query and the probe list is computed once per
  query, not per shard.
- **Shard-local packing.** Each shard packs ITS rows cluster-major with
  a fixed per-cluster capacity; the packed array is laid out
  block-sharded (shard s owns packed rows [s*P, (s+1)*P)), so the
  packing scatter moves no data across devices, and at query time a
  cluster's tile index is the same on every shard.
- **Query** (`shard_map`): score replicated queries against replicated
  centroids, take the batch-union probe list, gather+score only probed
  tiles of the local packed shard, local top-k, then ``all_gather`` of
  (scores, global ids) over ICI and an identical replicated merge —
  exactly the flat sharded merge (index/sharded.py).
- Overflow rows (cluster fuller than c_max on a shard) and post-build
  upserts live in a brute-forced tail, merged on the host side of the
  same device pass.  ``rebuild()`` folds them in.

Replaces: Qdrant's single-server HNSW at corpus sizes one chip cannot
hold (reference main.py:215-239 has no scale-out story at all).
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from financial_rag_system_tpu.index.base import SearchMixin
from financial_rag_system_tpu.index.ivf import ivf_probe_xla, spherical_kmeans
from financial_rag_system_tpu.index.store import PAD_CODE
from financial_rag_system_tpu.ops.topk import NEG_INF, masked_topk_xla
from financial_rag_system_tpu.parallel.mesh import AXIS_CORPUS


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def make_sharded_ivf_probe(
    mesh: Mesh, *, k: int, tile: int, nprobe: int, tpc: int, budget: int
):
    """Jitted shard_map probe: replicated queries, sharded packed corpus.

    fn(queries (B,D), qf (B,2), centroids (Kc,D) repl, packed (S*P, D)
    sharded, codes (2, S*P) sharded, gids (1, S*P) sharded)
    -> (B,k) scores / global ids, repl.

    Centroid scoring + probe-list union run INSIDE the jit (replicated,
    identical on every device): the eager per-op dispatch of the old
    host-side tile list multiplied the tunneled chip's per-call RPC
    floor on the staged path (index/ivf.py ivf_probe_search rationale).
    """
    from financial_rag_system_tpu.index.ivf import probe_tile_list

    def local_fn(queries, qf, packed, codes, gids, tile_ids):
        s, i = ivf_probe_xla(
            queries, qf, packed, codes, gids, tile_ids, k, tile=tile
        )
        all_s = jax.lax.all_gather(s, AXIS_CORPUS, axis=1, tiled=True)
        all_i = jax.lax.all_gather(i, AXIS_CORPUS, axis=1, tiled=True)
        ms, mpos = jax.lax.top_k(all_s, k)
        mi = jnp.take_along_axis(all_i, mpos, axis=1)
        return ms, mi.astype(jnp.int32)

    shard_fn = jax.shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(
            P(), P(), P(AXIS_CORPUS, None), P(None, AXIS_CORPUS),
            P(None, AXIS_CORPUS), P(),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def fn(queries, qf, centroids, packed, codes, gids):
        tile_ids = probe_tile_list(
            queries, centroids, nprobe=nprobe, tpc=tpc, budget=budget
        )
        return shard_fn(queries, qf, packed, codes, gids, tile_ids)

    return jax.jit(fn)


class ShardedIVFIndex(SearchMixin):
    """IVF tier over a ShardedFlatIndex (shares its store and mesh)."""

    KMEANS_SAMPLE = 131072

    def __init__(
        self,
        sharded_flat,
        *,
        n_clusters: int | None = None,
        nprobe: int = 8,
        tile: int = 128,
        kmeans_iters: int = 10,
    ):
        self.flat = sharded_flat
        self.mesh: Mesh = sharded_flat.mesh
        self.store = sharded_flat.store
        self.dtype = sharded_flat.dtype
        self.tile = tile
        self.n_shards = sharded_flat.n_shards
        n = sharded_flat.n_valid
        assert n > 0, "populate the sharded flat index first"
        self.n_clusters = min(n, n_clusters or max(4, int(np.sqrt(n / 4))))
        self.nprobe = min(nprobe, self.n_clusters)
        self.kmeans_iters = kmeans_iters
        self._probe_cache: dict[tuple[int, int], Any] = {}
        self._state, self._tail_rows = self._build()

    # -- build ------------------------------------------------------------

    def _build(self):
        """Returns (state, tail) for an atomic snapshot swap — concurrent
        searches must never pair an old packing with new centroids.  The
        packing GEOMETRY (c_max, tiles_per_cluster, packed_local,
        num_tiles_local) is part of the state tuple for the same reason:
        a search computing probe tile ids with new geometry against old
        packed arrays would probe silently wrong rows."""
        flat = self.flat
        n = flat.n_valid
        rows_per_shard = flat.capacity // self.n_shards

        # 1. global codebook from a corpus-wide sample, k-center-init
        # over the FULL (sharded) corpus: the farthest-point sweep
        # reaches outlier clusters the sample misses, and the Lloyd step
        # keeps empty-cluster centroids (index/ivf.py spherical_kmeans).
        # kcenter_rows is a plain jit over the global array — GSPMD
        # turns its per-step matvec + argmin into sharded compute with
        # one tiny collective per pool row.
        from financial_rag_system_tpu.index.hnsw import kcenter_rows

        kc, _ = kcenter_rows(
            flat._emb, jnp.int32(n), pool=self.n_clusters
        )
        init = flat._emb[kc].astype(jnp.float32)
        init = init / jnp.linalg.norm(init, axis=1, keepdims=True).clip(
            1e-6
        )
        rng = np.random.default_rng(0)
        sample = rng.choice(n, min(n, self.KMEANS_SAMPLE), replace=False)
        sample_vecs = flat._emb[jnp.asarray(np.sort(sample))].astype(
            jnp.float32
        )
        cent, _ = spherical_kmeans(
            sample_vecs, self.n_clusters, iters=self.kmeans_iters,
            init_cent=init,
        )
        # centroid values are unit-norm floats: an int8 cast would truncate
        # them to ~zeros, so quantized indexes keep bf16 centroids
        cent_dtype = (
            jnp.bfloat16 if getattr(flat, "quantized", False) else self.dtype
        )
        centroids = jax.device_put(
            cent.astype(cent_dtype), NamedSharding(self.mesh, P())
        )

        # 2. assignment of every valid row (chunked matmul, device)
        parts = []
        for s in range(0, n, self.KMEANS_SAMPLE):
            v = flat._emb[s : min(s + self.KMEANS_SAMPLE, n)].astype(
                jnp.float32
            )
            parts.append(
                jnp.argmax(
                    jnp.dot(v, cent.T, preferred_element_type=jnp.float32),
                    axis=1,
                )
            )
        assign = np.asarray(jnp.concatenate(parts))

        # 3. per-shard cluster-major packing positions (host arithmetic;
        # the data scatter below stays shard-local by construction)
        shard_of = np.arange(n) // rows_per_shard
        counts = np.zeros((self.n_shards, self.n_clusters), np.int64)
        for s in range(self.n_shards):
            mask = shard_of == s
            counts[s] = np.bincount(assign[mask], minlength=self.n_clusters)
        avg = max(1, int(counts.mean() * 2))
        c_max = _round_up(avg, self.tile)  # locals until the one-tuple swap
        tiles_per_cluster = c_max // self.tile
        packed_local = self.n_clusters * c_max  # rows per shard

        from financial_rag_system_tpu.index.base import build_ticker_lists

        rows_by_ticker = build_ticker_lists(flat, n)
        pos = np.full(n, -1, np.int64)
        tail: list[int] = []
        for s in range(self.n_shards):
            rows = np.where(shard_of == s)[0]
            a = assign[rows]
            order = np.argsort(a, kind="stable")
            sorted_a = a[order]
            starts = np.concatenate(
                [[0], np.cumsum(counts[s])[:-1]]
            )
            within = np.arange(rows.shape[0]) - starts[sorted_a]
            keep = within < c_max
            pos[rows[order[keep]]] = (
                s * packed_local + sorted_a[keep] * c_max + within[keep]
            )
            tail.extend(int(r) for r in rows[order[~keep]])

        kept = np.where(pos >= 0)[0]
        packed_n = packed_local * self.n_shards
        emb_shard = NamedSharding(self.mesh, P(AXIS_CORPUS, None))
        col_shard = NamedSharding(self.mesh, P(None, AXIS_CORPUS))
        jpos = jnp.asarray(pos[kept])
        jrows = jnp.asarray(kept)
        packed_emb = jax.device_put(
            jnp.zeros((packed_n, flat.dim), self.dtype)
            .at[jpos]
            .set(flat._emb[jrows].astype(self.dtype)),
            emb_shard,
        )
        packed_codes = jax.device_put(
            jnp.full((2, packed_n), PAD_CODE, jnp.int32)
            .at[:, jpos]
            .set(flat._codes[:, jrows]),
            col_shard,
        )
        packed_gids = jax.device_put(
            jnp.full((1, packed_n), -1, jnp.int32)
            .at[0, jpos]
            .set(jrows.astype(jnp.int32)),
            col_shard,
        )
        geom = (c_max, tiles_per_cluster, packed_local,
                packed_local // self.tile)
        state = (centroids, packed_emb, packed_codes, packed_gids,
                 rows_by_ticker, geom, pos)
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
    def c_max(self) -> int:
        return self._state[5][0]

    @property
    def tiles_per_cluster(self) -> int:
        return self._state[5][1]

    @property
    def packed_local(self) -> int:
        return self._state[5][2]

    @property
    def num_tiles_local(self) -> int:
        return self._state[5][3]

    def rebuild(self) -> None:
        """Old packing serves during the build; one-tuple swap."""
        self._state, self._tail_rows = self._build()

    @property
    def n_valid(self) -> int:
        return self.flat.n_valid

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

        state = self._state  # one atomic read
        centroids, packed_emb, packed_codes, packed_gids, rbt, geom, _ = state
        _c_max, tiles_per_cluster, _packed_local, num_tiles_local = geom
        tail = self._tail_rows
        b = query_vecs.shape[0]
        nprobe = self.nprobe  # snapshot: mutable tuning attribute
        budget = min(num_tiles_local, b * nprobe * tiles_per_cluster)
        q = self.flat.prep_queries(query_vecs)
        # keyed by the full probe geometry: nprobe/tpc/budget are baked
        # into the program as Python constants (same rationale as the
        # sharded-HNSW walk cache); nprobe is a mutable tuning attribute,
        # so a budget-preserving change must still recompile
        key = (k, budget, tiles_per_cluster, nprobe)
        fn = self._probe_cache.get(key)
        if fn is None:
            fn = make_sharded_ivf_probe(
                self.mesh, k=k, tile=self.tile, nprobe=nprobe,
                tpc=tiles_per_cluster, budget=budget,
            )
            self._probe_cache[key] = fn
        s, i = fn(
            q, query_filter, centroids, packed_emb, packed_codes,
            packed_gids,
        )
        extras = []
        # same cardinality strategy as the single-chip tiers: selective
        # filters are scored exactly (the gather crosses shards but the
        # row set is small by construction)
        rows = selective_rows(rbt, host_codes, self.SELECTIVE_LIMIT)
        if rows is not None:
            extras.append(score_rows(self.flat, rows, q, query_filter, k))
        if tail:
            extras.append(
                score_rows(self.flat, np.asarray(tail), q, query_filter, k)
            )
        return merge_candidates(s, i, extras, k)

    # -- upserts go to the tail until rebuild ------------------------------

    def upsert(self, ids, vectors, texts, payloads) -> int:
        existing = [
            self.store.id_to_row[p] for p in ids if p in self.store.id_to_row
        ]
        start = self.flat.n_valid
        added = self.flat.upsert(ids, vectors, texts, payloads)
        self._tail_rows.extend(range(start, self.flat.n_valid))
        if existing:
            # re-upserted rows: the flat arrays now hold the fresh
            # embedding but the packed IVF copy is stale — mask the packed
            # slot and serve the row from the brute-forced tail until
            # rebuild() (mirrors Qdrant's immediate-upsert semantics)
            state = self._state
            row_to_pos = state[6]
            masked = [
                r for r in existing
                if r < len(row_to_pos) and row_to_pos[r] >= 0
            ]
            if masked:
                gids = jax.device_put(
                    state[3].at[0, jnp.asarray(row_to_pos[masked])].set(-1),
                    NamedSharding(self.mesh, P(None, AXIS_CORPUS)),
                )
                rtp = row_to_pos.copy()
                rtp[masked] = -1
                self._state = state[:3] + (gids,) + state[4:6] + (rtp,)
                self._tail_rows.extend(masked)
            # rows already in the tail re-score from the updated flat
            # arrays automatically; no second tail entry needed
        return added
