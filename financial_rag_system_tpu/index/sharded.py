"""Mesh-sharded corpus search: per-shard top-k + all-gather merge.

The scaling tier the reference never had (SURVEY.md §5.8): corpus rows
shard across the ``corpus`` mesh axis via ``NamedSharding``; under
``shard_map`` each device runs the fused masked top-k over its local
rows, local row ids are offset to global ids, the (B, k) partial results
``all_gather`` over ICI, and every device computes the identical global
merge (a top-k over n_shards*k candidates) — so the result is replicated
and no host round-trip happens anywhere.

Padding note: capacity is padded per-shard (each shard a multiple of the
Pallas tile); ``n_valid`` rows are laid out contiguously round-robin-free
(block layout), so shard s owns global rows [s*rows_per_shard, ...).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from financial_rag_system_tpu.index.base import SearchMixin
from financial_rag_system_tpu.index.store import PAD_CODE, DocumentStore
from financial_rag_system_tpu.ops.topk import masked_topk_xla, masked_topk_pallas
from financial_rag_system_tpu.parallel.mesh import AXIS_CORPUS

DEFAULT_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def device_full(sharding: NamedSharding, shape, dtype, fill=0) -> jax.Array:
    """Sharded constant built ON device (``jit`` + ``out_shardings``),
    never via ``jax.device_put`` of a host buffer.

    ``device_put`` of host data onto a multi-process ``NamedSharding``
    runs jax's ``assert_equal`` — a ``process_allgather`` of the WHOLE
    array — as a cross-process value check.  That is (a) wasted
    bandwidth at corpus scale (the check gathers every shard to every
    host) and (b) often the process's FIRST collective, whose Gloo/ICI
    context initialization carries a fixed ~30 s deadline: under
    multi-process startup skew (contended CPU, cold jit caches) it
    times out before the peers rendezvous — observed as a
    tests/test_multihost suite flake.  A jitted constant computes each
    local shard in place: no host buffer, no collective, no rendezvous.
    """
    return jax.jit(
        lambda: jnp.full(shape, fill, dtype), out_shardings=sharding
    )()


def host_to_global(
    sharding: NamedSharding, arr: np.ndarray, dtype=None
) -> jax.Array:
    """Place host data onto a (possibly multi-process) sharding without
    ``device_put``'s assert_equal allgather: callers guarantee every
    process passes identical host data (the op-broadcast lockstep
    contract), so each device just reads its own slice of the local
    buffer via ``make_array_from_callback``."""
    if dtype is not None:
        arr = np.asarray(arr, jnp.dtype(dtype))
    else:
        arr = np.asarray(arr)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def make_sharded_search(
    mesh: Mesh,
    *,
    k: int,
    tile: int = DEFAULT_TILE,
    use_pallas: bool = False,
):
    """Build the jitted sharded search fn.

    fn(queries (B,D) repl, emb (N,D) corpus-sharded, codes (2,N) sharded,
       query_filter (B,2) repl, n_valid scalar repl) -> (B,k) scores/ids,
    replicated.
    """

    def local_search(queries, emb, codes, qf, n_valid):
        shard_rows = emb.shape[0]
        sid = jax.lax.axis_index(AXIS_CORPUS)
        base = sid * shard_rows
        # valid rows within this shard: clamp(n_valid - base, 0, shard_rows)
        local_valid = jnp.clip(n_valid - base, 0, shard_rows)
        if use_pallas:
            s, i = masked_topk_pallas(queries, emb, codes, qf, local_valid, k, tile=tile)
        else:
            s, i = masked_topk_xla(queries, emb, codes, qf, local_valid, k)
        # -1 padding (shard smaller than k) must not alias a real row
        gi = jnp.where(i >= 0, i + base, -1)
        # gather partials from every shard: (B, n_shards*k)
        all_s = jax.lax.all_gather(s, AXIS_CORPUS, axis=1, tiled=True)
        all_i = jax.lax.all_gather(gi, AXIS_CORPUS, axis=1, tiled=True)
        ms, mpos = jax.lax.top_k(all_s, k)
        mi = jnp.take_along_axis(all_i, mpos, axis=1)
        return ms, mi.astype(jnp.int32)

    fn = jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(P(), P(AXIS_CORPUS, None), P(None, AXIS_CORPUS), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedFlatIndex(SearchMixin):
    """Exact search over a corpus sharded across the mesh's corpus axis.

    Host-side bookkeeping matches FlatIndex (same DocumentStore contract);
    device arrays are placed with NamedSharding so XLA keeps each shard
    resident on its device and the search never re-shards.
    """

    def __init__(
        self,
        mesh: Mesh,
        dim: int = 384,
        *,
        capacity: int = 1 << 15,
        tile: int = DEFAULT_TILE,
        dtype: jnp.dtype = jnp.bfloat16,
        use_pallas: bool = False,
        token_store_len: int | str | None = None,
        tokenizer=None,
        token_store_max: int | None = None,
    ):
        from financial_rag_system_tpu.ops.topk import pallas_available

        self.mesh = mesh
        self.dim = dim
        self.tile = tile
        self.dtype = jnp.dtype(dtype)
        # int8 mode: same symmetric row/query quantization as FlatIndex —
        # scores are cosine * 127^2, ranking-preserving, half the HBM of
        # bf16 per shard (so ~2x corpus per chip at equal memory)
        self.quantized = self.dtype == jnp.int8
        # construction-time gate: compiled Pallas kernels cannot lower on
        # the CPU backend (same normalization as FlatIndex); int8 rides
        # the kernel behind the FRS_INT8_PALLAS kill switch
        from financial_rag_system_tpu.ops.topk import int8_pallas_enabled

        self.use_pallas = (
            use_pallas
            and pallas_available()
            and (not self.quantized or int8_pallas_enabled())
        )
        self.n_shards = mesh.shape[AXIS_CORPUS]
        per_shard = _round_up(
            max(capacity // self.n_shards, tile), tile
        )
        self.capacity = per_shard * self.n_shards
        self.store = DocumentStore()
        # auto mode mirrors FlatIndex: materialize at the measured p99
        # width on first upsert, widen in 32-token steps (see
        # flat.py _autosize_token_store — deterministic in the upsert
        # stream, so op-broadcast lockstep holds)
        from financial_rag_system_tpu.index.flat import (
            DEFAULT_TOKEN_STORE_MAX,
        )

        self._auto_dlen = token_store_len == "auto" and tokenizer is not None
        if token_store_len == "auto":
            token_store_len = None
        self.token_store_len = token_store_len
        self.token_store_max = token_store_max or DEFAULT_TOKEN_STORE_MAX
        self._tok_lengths: list[int] = []
        self.tokenizer = tokenizer
        self._emb_sharding = NamedSharding(mesh, P(AXIS_CORPUS, None))
        self._codes_sharding = NamedSharding(mesh, P(None, AXIS_CORPUS))
        self._dtok_sharding = NamedSharding(mesh, P(AXIS_CORPUS, None))
        # like FlatIndex: the device arrays live in ONE tuple swapped as a
        # unit so a concurrent reader never pairs a grown emb with an
        # ungrown codes/token-store (see flat.py _arrays comment)
        self._arrays = (
            device_full(self._emb_sharding, (self.capacity, dim), self.dtype),
            device_full(
                self._codes_sharding, (2, self.capacity), jnp.int32, PAD_CODE
            ),
            (
                device_full(
                    self._dtok_sharding,
                    (self.capacity, token_store_len),
                    jnp.int32,
                )
                if token_store_len
                else None
            ),
        )
        self._search_cache: dict[int, Any] = {}

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

    # ------------------------------------------------------------------
    @property
    def n_valid(self) -> int:
        return len(self.store)

    @property
    def token_store_enabled(self) -> bool:
        """See FlatIndex.token_store_enabled."""
        return self._doc_tok is not None or self._auto_dlen

    def _grown(self, arrays, needed: int):
        """Grown copies of ``arrays`` (no attribute mutation — the caller
        swaps the full tuple once)."""
        per_shard = self.capacity // self.n_shards
        while per_shard * self.n_shards < needed:
            per_shard *= 2
        new_cap = per_shard * self.n_shards
        old_emb, old_codes, old_dtok = arrays

        # grown copies are computed ON device (rows redistribute over
        # ICI inside the jitted program) — never via a host round trip,
        # which at corpus scale would materialize the full array on every
        # host AND pay device_put's assert_equal allgather (see
        # device_full).  Runs in op-broadcast lockstep, so the resharding
        # collective is not startup-skew-sensitive.
        def _grow_rows(old, sharding, fill=0):
            return jax.jit(
                lambda x: jnp.full(
                    (new_cap, x.shape[1]), fill, x.dtype
                ).at[: x.shape[0]].set(x),
                out_shardings=sharding,
            )(old)

        emb = _grow_rows(old_emb, self._emb_sharding)
        codes = jax.jit(
            lambda x: jnp.full((2, new_cap), PAD_CODE, jnp.int32)
            .at[:, : x.shape[1]].set(x),
            out_shardings=self._codes_sharding,
        )(old_codes)
        dtok = (
            _grow_rows(old_dtok, self._dtok_sharding)
            if old_dtok is not None
            else None
        )
        self.capacity = new_cap
        return (emb, codes, dtok)

    def upsert(
        self,
        ids: Sequence[str],
        vectors: np.ndarray,
        texts: Sequence[str],
        payloads: Sequence[dict[str, Any]],
    ) -> int:
        if not len(ids):
            return 0
        vecs = np.asarray(vectors, np.float32)
        vecs = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        if self.quantized:
            vecs = np.clip(np.rint(vecs * 127.0), -127, 127)
        rows, code_rows, new_count = [], [], 0
        for pid, text, payload in zip(ids, texts, payloads):
            row, is_new = self.store.upsert(pid, text, payload)
            new_count += is_new
            rows.append(row)
            code_rows.append(self.store.codes_for(payload))
        arrays = self._arrays
        if len(self.store) > self.capacity:
            arrays = self._grown(arrays, len(self.store))
        emb, codes, dtok = arrays
        tok_lists = None
        if self.tokenizer is not None and (
            dtok is not None or self._auto_dlen
        ):
            tok_lists = [self.tokenizer.tokenize_ids(t) for t in texts]
            if self._auto_dlen:
                dtok = self._autosized_dtok(
                    dtok, [len(t) + 1 for t in tok_lists]
                )
        rows_a = np.asarray(rows)
        # scattered device update keeping the sharding
        emb = jax.device_put(
            emb.at[rows_a].set(jnp.asarray(vecs, self.dtype)),
            self._emb_sharding,
        )
        codes = jax.device_put(
            codes.at[:, rows_a].set(
                jnp.asarray(np.asarray(code_rows, np.int32).T)
            ),
            self._codes_sharding,
        )
        if dtok is not None and tok_lists is not None:
            from financial_rag_system_tpu.models.tokenizer import SEP_ID

            dlen = self.token_store_len
            tok_rows = np.zeros((len(texts), dlen), np.int32)
            for i, tids in enumerate(tok_lists):
                tids = tids[: dlen - 1] + [SEP_ID]
                tok_rows[i, : len(tids)] = tids
            dtok = jax.device_put(
                dtok.at[rows_a].set(jnp.asarray(tok_rows)),
                self._dtok_sharding,
            )
        self._arrays = (emb, codes, dtok)  # one swap
        return new_count

    def _autosized_dtok(self, dtok, lengths: list[int]):
        """Auto token store for the sharded tier: returns the (possibly
        freshly materialized or widened) dtok WITHOUT touching
        self._arrays — the caller owns the single atomic swap.  Same
        policy as flat.py _autosize_token_store."""
        from financial_rag_system_tpu.index.flat import (
            _round_up as _ru,
            auto_token_width,
        )

        self._tok_lengths.extend(lengths)
        want = auto_token_width(self._tok_lengths, cap=self.token_store_max)
        cur = self.token_store_len or 0
        if dtok is None:
            self.token_store_len = want
            return device_full(
                self._dtok_sharding, (self.capacity, want), jnp.int32
            )
        if want <= cur:
            return dtok
        new_w = min(_ru(want, 32), self.token_store_max)
        if new_w <= cur:
            return dtok
        from financial_rag_system_tpu.models.tokenizer import SEP_ID

        self.token_store_len = new_w
        n = len(self.store)
        rebuilt = np.zeros((self.capacity, new_w), np.int32)
        for r in range(n):
            tids = self.tokenizer.tokenize_ids(
                self.store.texts[r]
            )[: new_w - 1] + [SEP_ID]
            rebuilt[r, : len(tids)] = tids
        # every process rebuilds from identical host texts (lockstep
        # contract), so no cross-process value check is needed
        return host_to_global(self._dtok_sharding, rebuilt, jnp.int32)

    def search_device(
        self, query_vecs: jax.Array, query_filter: jax.Array, k: int,
        *, host_codes=None,
    ):
        fn = self._search_cache.get(k)
        if fn is None:
            fn = make_sharded_search(
                self.mesh, k=k, tile=self.tile, use_pallas=self.use_pallas
            )
            self._search_cache[k] = fn
        emb, codes, _ = self._arrays  # one snapshot (see _arrays comment)
        return fn(
            self.prep_queries(query_vecs),
            emb,
            codes,
            query_filter,
            jnp.asarray(min(self.n_valid, emb.shape[0]), jnp.int32),
        )

    def prep_queries(self, query_vecs):
        """Match queries to the corpus representation (cast, or the same
        symmetric int8 quantization as the rows — see FlatIndex)."""
        if self.quantized:
            q = query_vecs.astype(jnp.float32) * 127.0
            return jnp.clip(jnp.round(q), -127, 127).astype(jnp.int8)
        return query_vecs.astype(self.dtype)

    # search()/search_batch() come from SearchMixin.

    # ------------------------------------------------------------------
    @staticmethod
    def _host_copy(arr) -> np.ndarray:
        """Device->host copy that works for multi-process global arrays
        (a cross-process gather, so every process must call it — the
        op-broadcast control plane guarantees that for save())."""
        if arr.is_fully_addressable:
            return np.asarray(arr)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(arr, tiled=True))

    def save(self, directory: str) -> None:
        """Checkpoint is mesh-shape independent: arrays land as plain
        host npz and re-place onto whatever mesh loads them.  In
        multi-process serving every process joins the gather; process 0
        writes the files."""
        import os

        arrays = self._arrays  # one snapshot
        emb = self._host_copy(arrays[0])
        codes = self._host_copy(arrays[1])
        dtok = (
            self._host_copy(arrays[2]) if arrays[2] is not None else None
        )
        if jax.process_index() != 0:
            return
        os.makedirs(directory, exist_ok=True)
        extra = {"dtok": dtok} if dtok is not None else {}
        np.savez_compressed(
            os.path.join(directory, "sharded_index.npz"),
            emb=np.asarray(emb, np.float32),
            codes=codes,
            meta=np.asarray(
                [self.dim, self.tile, self.capacity, int(self.quantized),
                 self.token_store_len or 0]
            ),
            **extra,
        )
        self.store.save(os.path.join(directory, "store.json"))

    @staticmethod
    def load(
        directory: str,
        mesh: Mesh,
        *,
        use_pallas: bool = False,
        tokenizer=None,
    ) -> "ShardedFlatIndex":
        import os

        data = np.load(os.path.join(directory, "sharded_index.npz"))
        meta = [int(x) for x in data["meta"]]
        dim, tile, capacity = meta[:3]
        quantized = bool(meta[3]) if len(meta) > 3 else False
        dlen = meta[4] if len(meta) > 4 else 0
        has_dtok = dlen > 0 and "dtok" in data
        idx = ShardedFlatIndex(
            mesh, dim, capacity=capacity, tile=tile, use_pallas=use_pallas,
            dtype=jnp.int8 if quantized else jnp.bfloat16,
            token_store_len=dlen if has_dtok else None,
            tokenizer=tokenizer if has_dtok else None,
        )
        if idx.capacity != capacity:  # mesh shape changed; re-pad per shard
            emb = np.zeros((idx.capacity, dim), np.float32)
            codes = np.full((2, idx.capacity), PAD_CODE, np.int32)
            emb[:capacity] = data["emb"]
            codes[:, :capacity] = data["codes"]
            dtok = None
            if has_dtok:
                dtok = np.zeros((idx.capacity, dlen), np.int32)
                dtok[:capacity] = data["dtok"]
        else:
            emb, codes = data["emb"], data["codes"]
            dtok = data["dtok"] if has_dtok else None
        idx._arrays = (  # one swap; host_to_global: every process reads
            # the same npz, so no cross-process equality gather is needed
            host_to_global(idx._emb_sharding, emb, idx.dtype),
            host_to_global(idx._codes_sharding, codes, jnp.int32),
            (
                host_to_global(idx._dtok_sharding, dtok, jnp.int32)
                if dtok is not None
                else None
            ),
        )
        idx.store = DocumentStore.load(os.path.join(directory, "store.json"))
        return idx
