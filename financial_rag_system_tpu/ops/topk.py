"""Fused masked-similarity + streaming top-k — the retrieval hot kernel.

This op replaces the reference's entire Qdrant round-trip
(``qdrant.query_points(collection, vector, limit=15, filter=ticker/doc_type)``,
reference main.py:215-239): cosine scores of a query batch against the
HBM-resident corpus, metadata filtering as an on-device mask, and top-k
selection — in one pass, with the (B, N) score matrix never leaving
VMEM.

Two implementations with identical semantics:

- :func:`masked_topk_xla` — pure jnp (``einsum`` + ``lax.top_k``); the
  correctness reference, used on CPU and as a fallback.  XLA fuses the
  mask into the matmul epilogue but materializes all B*N scores in HBM,
  which caps throughput at HBM bandwidth for large corpora.
- :func:`masked_topk_pallas` — a Pallas TPU kernel that streams corpus
  tiles HBM->VMEM, computes each (B, T) score tile on the MXU, masks on
  the VPU, and merges into a running (B, K) best list in VMEM.  Scores
  are never written to HBM; per-tile merge is skipped entirely when the
  tile's masked max cannot beat any row's current k-th best.

Filter encoding: each corpus row carries int32 ``[ticker_code,
doc_type_code]``; each query carries required codes where ``-1`` means
wildcard (the reference's optional ``document_type`` filter,
main.py:224-231).  Padding rows use code ``-2`` and are additionally
masked by ``n_valid``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float("-inf")
_BIG_I32 = 2**30


def _match_mask(codes: jax.Array, query_filter: jax.Array) -> jax.Array:
    """(B, N) bool — row passes the query's metadata filter.

    codes: (2, N) int32 [ticker; doc_type].  query_filter: (B, 2) int32,
    -1 = wildcard.
    """
    tick_q = query_filter[:, 0:1]  # (B, 1)
    dt_q = query_filter[:, 1:2]
    tick_c = codes[0:1, :]  # (1, N)
    dt_c = codes[1:2, :]
    tick_ok = (tick_q == -1) | (tick_q == tick_c)
    dt_ok = (dt_q == -1) | (dt_q == dt_c)
    return tick_ok & dt_ok


def masked_topk_xla(
    queries: jax.Array,
    corpus: jax.Array,
    codes: jax.Array,
    query_filter: jax.Array,
    n_valid: jax.Array | int,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Reference implementation. queries (B,D), corpus (N,D), codes (2,N)."""
    scores = jnp.dot(
        queries.astype(corpus.dtype),
        corpus.T,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, N)
    n = corpus.shape[0]
    valid = (
        jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        < jnp.asarray(n_valid, jnp.int32)
    )
    mask = _match_mask(codes, query_filter) & valid
    scores = jnp.where(mask, scores, NEG_INF)
    # a corpus (or shard) smaller than k pads with -inf/-1 slots so
    # callers always get a (B, k) result (e.g. tiny per-shard slices)
    kk = min(k, n)
    top_s, top_i = jax.lax.top_k(scores, kk)
    if kk < k:
        b = scores.shape[0]
        top_s = jnp.concatenate(
            [top_s, jnp.full((b, k - kk), NEG_INF, top_s.dtype)], axis=1
        )
        top_i = jnp.concatenate(
            [top_i, jnp.full((b, k - kk), -1, top_i.dtype)], axis=1
        )
    return top_s, top_i.astype(jnp.int32)


# ---------------------------------------------------------------------------
# Pallas kernel
# ---------------------------------------------------------------------------


def _topk_kernel(
    nvalid_ref,  # SMEM (1, 1) int32
    q_ref,  # VMEM (B, D)
    qf_ref,  # VMEM (B, 2) int32
    c_ref,  # VMEM (T, D) — corpus tile
    codes_ref,  # VMEM (2, T) int32 — tile metadata
    out_s_ref,  # VMEM (B, K) f32 — running best scores (constant index map)
    out_i_ref,  # VMEM (B, K) int32 — running best global row ids
    *,
    k: int,
    tile: int,
    int8_mxu: bool = False,
    lazy_mask: bool = False,
):
    step = pl.program_id(0)
    b = q_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        out_s_ref[:] = jnp.full_like(out_s_ref, NEG_INF)
        out_i_ref[:] = jnp.zeros_like(out_i_ref)

    # (B, T) scores on the MXU.  int8 corpora stream at half the HBM
    # bytes of bf16 and score exactly either way (|q|,|c| <= 127):
    #  - int8_mxu: native int8 x int8 -> int32 systolic passes (2x the
    #    bf16 MXU rate on v5e; no quantization work — operands are
    #    already int8).  |score| <= 127*127*D < 2^24, so the f32 cast is
    #    exact and ranking is bit-identical to the widened path.
    #  - widened: cast to f32 in VMEM and take the bf16 MXU path (the
    #    values are integers <= 127, exactly representable in bf16).
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

    def _mask(scores):
        # Metadata + padding mask on the VPU.
        tick_q = qf_ref[:, 0:1]
        dt_q = qf_ref[:, 1:2]
        tick_c = codes_ref[0:1, :]
        dt_c = codes_ref[1:2, :]
        match = ((tick_q == -1) | (tick_q == tick_c)) & (
            (dt_q == -1) | (dt_q == dt_c)
        )
        local_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
        gids = local_ids + step * tile
        match = match & (gids < nvalid_ref[0, 0])
        return jnp.where(match, scores, NEG_INF), gids

    # lazy_mask gates on the UNMASKED tile max (one VPU reduce), so
    # non-improving tiles skip the whole VPU mask chain; the merge
    # itself always uses masked scores, so results are bit-identical
    # either way.  MEASURED NEGATIVE RESULT (scripts/tpu_probes.py
    # --probe maskgate, interleaved A/B on the v5e, 2.8 GiB int8):
    # wildcard filters -0.18 ms paired-median (noise), 1/8-ticker
    # filters -5.97 ms — the raw-max gate fires on far more tiles than
    # the masked gate when a filter excludes most rows, and each extra
    # merge pays the k-iteration selection sort over (B, K+T), which
    # dwarfs the ~0.7 us/tile mask chain it saves.  Default stays eager.
    if not lazy_mask:
        s, _ = _mask(s)
    tile_max = jnp.max(s, axis=1)  # (B,)
    kth_best = out_s_ref[:, k - 1]  # (B,)
    can_improve = jnp.any(tile_max > kth_best)

    @pl.when(can_improve)
    def _merge():
        if lazy_mask:
            ms, gids = _mask(s)
        else:
            ms = s
            gids = (
                jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
                + step * tile
            )
        cat_s = jnp.concatenate([out_s_ref[:], ms], axis=1)  # (B, K+T)
        cat_i = jnp.concatenate([out_i_ref[:], gids], axis=1)
        width = k + tile
        pos = jax.lax.broadcasted_iota(jnp.int32, (b, width), 1)
        for j in range(k):
            m = jnp.max(cat_s, axis=1, keepdims=True)  # (B, 1)
            first = jnp.min(
                jnp.where(cat_s == m, pos, _BIG_I32), axis=1, keepdims=True
            )
            sel = pos == first  # one-hot (B, K+T)
            out_s_ref[:, j : j + 1] = m
            out_i_ref[:, j : j + 1] = jnp.sum(
                jnp.where(sel, cat_i, 0), axis=1, keepdims=True
            )
            cat_s = jnp.where(sel, NEG_INF, cat_s)


def int8_pallas_enabled() -> bool:
    """int8 corpora through the compiled Pallas kernels.

    The kernels widen int8 tiles in VMEM (see _topk_kernel), so HBM
    traffic halves while scores stay exact; validated on a live chip via
    ``scripts/tpu_probes.py --probe int8`` (rows match the XLA reference
    bit-for-bit).  ``FRS_INT8_PALLAS=0`` is the operator kill switch.
    """
    import os

    return os.environ.get("FRS_INT8_PALLAS", "1") != "0"


def pallas_available() -> bool:
    """True when the default backend can run compiled Pallas kernels.

    Pallas-call lowering on the CPU backend supports interpret mode only,
    so every ``use_pallas`` flag must be ANDed with this at construction
    time — otherwise a CPU run (tests, multi-host CPU dry-runs) traces a
    kernel it cannot lower.
    """
    return jax.devices()[0].platform == "tpu"


def int8_mxu_enabled() -> bool:
    """Score int8 corpora with native int8 x int8 -> int32 MXU passes.

    Measured on the v5e (scripts/tpu_probes.py --probe int8mxu, 2.8 GiB
    corpus): a consistent ~4% device-time win over widening int8 tiles
    to f32 in VMEM (8.06 -> 7.73 ms and 13.46 -> 12.09 ms across two
    sessions) with bit-identical rankings — the scan's per-tile cost is
    dominated by the VPU mask chain + merge, not the score matmul, so
    the int8 systolic rate is a small help, not the 2x the peak ratio
    suggests.  ``FRS_INT8_MXU=0`` is the kill switch.
    """
    import os

    return os.environ.get("FRS_INT8_MXU", "1") != "0"


def masked_topk_pallas(
    queries: jax.Array,
    corpus: jax.Array,
    codes: jax.Array,
    query_filter: jax.Array,
    n_valid: jax.Array | int,
    k: int,
    *,
    tile: int = 1024,
    interpret: bool = False,
    int8_mxu: bool | None = None,
    lazy_mask: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Streaming fused top-k. corpus rows must be a multiple of ``tile``.

    Resolves the int8 MXU-path default from the environment OUTSIDE the
    jit cache (``int8_mxu=None``), then dispatches to the jitted kernel
    builder.
    """
    if int8_mxu is None:
        int8_mxu = int8_mxu_enabled()
    return _masked_topk_pallas_jit(
        queries, corpus, codes, query_filter, n_valid, k,
        tile=tile, interpret=interpret, int8_mxu=int8_mxu,
        lazy_mask=lazy_mask,
    )


@functools.partial(
    jax.jit,
    static_argnames=("k", "tile", "interpret", "int8_mxu", "lazy_mask"),
)
def _masked_topk_pallas_jit(
    queries: jax.Array,
    corpus: jax.Array,
    codes: jax.Array,
    query_filter: jax.Array,
    n_valid: jax.Array | int,
    k: int,
    *,
    tile: int = 1024,
    interpret: bool = False,
    int8_mxu: bool = False,
    lazy_mask: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """The (B, K) output blocks use a constant index map, so they stay
    resident in VMEM across the sequential corpus-tile grid and are the
    running state — no separate scratch or final copy.
    """
    b, d = queries.shape
    n = corpus.shape[0]
    assert n % tile == 0, f"corpus rows {n} not a multiple of tile {tile}"
    assert codes.shape == (2, n)
    num_tiles = n // tile
    nvalid_arr = jnp.reshape(jnp.asarray(n_valid, jnp.int32), (1, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((b, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
    )

    kernel = functools.partial(
        _topk_kernel, k=k, tile=tile, int8_mxu=int8_mxu, lazy_mask=lazy_mask
    )
    out_s, out_i = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * corpus.dtype.itemsize + b * d * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(nvalid_arr, queries, query_filter, corpus, codes)
    return out_s, out_i


def masked_topk(
    queries: jax.Array,
    corpus: jax.Array,
    codes: jax.Array,
    query_filter: jax.Array,
    n_valid: jax.Array | int,
    k: int,
    *,
    tile: int = 1024,
    use_pallas: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Dispatch to the Pallas kernel on TPU, XLA elsewhere."""
    on_tpu = jax.devices()[0].platform == "tpu"
    if use_pallas and on_tpu and corpus.shape[0] % tile == 0:
        return masked_topk_pallas(
            queries, corpus, codes, query_filter, n_valid, k, tile=tile
        )
    return masked_topk_xla(queries, corpus, codes, query_filter, n_valid, k)
