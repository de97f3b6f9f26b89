"""On-chip probes: kernel bandwidth, scale tiers, RPC floor, int8 gate.

Round-1 findings these reproduce (see README "Measurement notes"):
- a tunneled chip pays a per-call RPC floor (measure it FIRST — it
  dominates every naive per-call latency number);
- the streaming masked-top-k kernel reads HBM at ~600+ GiB/s device-side
  (derived by subtracting the floor);
- 10M x 384 bf16 rows (7.5 GiB) fit and scan on one v5e chip;
- int8 through the compiled Pallas kernel is semantically correct in
  interpret mode; run `--probe int8` on a real chip to validate lowering
  before enabling quantized+Pallas in FlatIndex (ops/topk.py gate).

Usage: python scripts/tpu_probes.py --probe floor|scan|int8 [--rows N]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

# repo-root import path WITHOUT PYTHONPATH: setting PYTHONPATH=/root/repo
# breaks the axon TPU plugin's registration at interpreter startup on
# this rig (backend 'axon' vanishes from the registry), so the script
# fixes sys.path itself — run it as `python scripts/tpu_probes.py`.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg: str) -> None:
    print(msg, flush=True)


def rpc_floor(with_jitter: bool = False):
    """Round-trip of a trivial op — the per-call overhead baseline.

    ``with_jitter=True`` also returns the floor's p90−p50 spread: a
    floor-subtracted device time smaller than a few× this is NOT a
    device measurement, it's tunnel noise (the resolution limit every
    subtracted figure inherits)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def tiny(x):
        return (x @ x).sum()

    x = jnp.ones((128, 128), jnp.bfloat16)
    np.asarray(tiny(x))  # warm (first readback pays tunnel setup)
    ts = []
    for _ in range(20):
        t0 = time.time()
        np.asarray(tiny(x))
        ts.append((time.time() - t0) * 1e3)
    floor = float(np.percentile(ts, 50))
    jitter = float(np.percentile(ts, 90)) - floor
    log(f"rpc floor p50: {floor:.2f} ms (p90-p50 jitter {jitter:.2f} ms)")
    return (floor, jitter) if with_jitter else floor


def _device_corpus(n: int, d: int = 384, dtype: str = "bf16"):
    import jax
    import jax.numpy as jnp

    ch = min(1_310_720, n)
    # tile must divide n; scan() passes n as a multiple of its chunk

    quantized = dtype == "int8"

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, key, start):
        v = jax.random.normal(key, (ch, d), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        if quantized:  # same symmetric scheme as FlatIndex int8 mode
            v = jnp.clip(jnp.round(v * 127.0), -127, 127).astype(jnp.int8)
        else:
            v = v.astype(jnp.bfloat16)
        return jax.lax.dynamic_update_slice(buf, v, (start, 0))

    assert n % ch == 0, f"rows {n} must be a multiple of chunk {ch}"
    emb = jnp.zeros((n, d), jnp.int8 if quantized else jnp.bfloat16)
    for i in range(n // ch):
        emb = fill(emb, jax.random.PRNGKey(i), i * ch)
    codes = jnp.stack(
        [jnp.arange(n, dtype=jnp.int32) % 8, jnp.arange(n, dtype=jnp.int32) % 2]
    )
    jax.block_until_ready(emb)
    return emb, codes


def scan(rows: int, dtype: str = "bf16") -> None:
    """Flat masked-top-k over `rows` corpus rows; reports device-side
    bandwidth with the RPC floor subtracted.  ``dtype="int8"`` streams a
    quantized corpus through the same compiled Pallas kernel — half the
    HBM bytes/row, so ~2x rows/chip at equal scan time (the README's
    ~20M-chunks/chip figure)."""
    import jax.numpy as jnp

    from financial_rag_system_tpu.ops.topk import masked_topk_pallas

    floor = rpc_floor()
    ch = min(1_310_720, max(2048, rows))
    n = max(2048, (rows // ch) * ch)  # whole chunks only: no zero rows
    emb, codes = _device_corpus(n, dtype=dtype)
    log(f"corpus {emb.nbytes / 2**30:.2f} GiB on device ({dtype})")
    b = 32
    qs = []
    for it in range(12):
        import jax

        q = jax.random.normal(jax.random.PRNGKey(100 + it), (b, 384), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        if dtype == "int8":
            q = jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8)
        else:
            q = q.astype(jnp.bfloat16)
        qs.append(q)
    qf = jnp.stack(
        [jnp.arange(b, dtype=jnp.int32) % 8, jnp.full((b,), -1, jnp.int32)],
        axis=1,
    )
    np.asarray(masked_topk_pallas(qs[0], emb, codes, qf, n, 10, tile=2048)[1])
    ts = []
    for it in range(1, 12):
        t0 = time.time()
        _, r = masked_topk_pallas(qs[it], emb, codes, qf, n, 10, tile=2048)
        np.asarray(r)
        ts.append((time.time() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    dev_ms = max(p50 - floor, 1e-3)
    gib = emb.nbytes / 2**30
    log(
        f"scan p50 {p50:.2f} ms/batch{b} wall | device-side ~{dev_ms:.2f} ms "
        f"=> ~{gib / (dev_ms / 1e3):.0f} GiB/s"
    )


def int8_gate(rows: int) -> None:
    """Compiled-Pallas int8 vs XLA reference on chip.  If rows/scores
    match, flip the `not self.quantized` term out of FlatIndex.use_pallas
    and re-run the quantized tests on hardware."""
    import jax.numpy as jnp

    from financial_rag_system_tpu.ops.topk import (
        masked_topk_pallas,
        masked_topk_xla,
    )

    rng = np.random.default_rng(0)
    n = max(2048, (rows // 2048) * 2048)
    v = rng.standard_normal((n, 384)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    vi = np.clip(np.rint(v * 127), -127, 127).astype(np.int8)
    q = v[:8] + 0.01
    qi = np.clip(np.rint(q * 127), -127, 127).astype(np.int8)
    codes = np.zeros((2, n), np.int32)
    qf = np.full((8, 2), -1, np.int32)
    s_p, r_p = masked_topk_pallas(
        jnp.asarray(qi), jnp.asarray(vi), jnp.asarray(codes),
        jnp.asarray(qf), n, 10, tile=2048,
    )
    s_x, r_x = masked_topk_xla(
        jnp.asarray(qi), jnp.asarray(vi), jnp.asarray(codes),
        jnp.asarray(qf), n, 10,
    )
    match = bool(np.array_equal(np.asarray(r_p), np.asarray(r_x)))
    log(f"int8 pallas-vs-xla rows match: {match}")
    if not match:
        log(f"  pallas[0]: {np.asarray(r_p)[0]}")
        log(f"  xla[0]:    {np.asarray(r_x)[0]}")

    # the probed-tiles IVF kernel through the same int8 path
    from financial_rag_system_tpu.index.ivf import (
        ivf_probe_pallas,
        ivf_probe_xla,
    )

    tile = 256
    num_tiles = n // tile
    gids = np.arange(n, dtype=np.int32).reshape(1, n)
    tids = np.arange(num_tiles, dtype=np.int32)  # probe everything
    s_p2, r_p2 = ivf_probe_pallas(
        jnp.asarray(qi), jnp.asarray(qf), jnp.asarray(vi),
        jnp.asarray(codes), jnp.asarray(gids), jnp.asarray(tids), 10,
        tile=tile, probe_budget=num_tiles,
    )
    s_x2, r_x2 = ivf_probe_xla(
        jnp.asarray(qi), jnp.asarray(qf), jnp.asarray(vi),
        jnp.asarray(codes), jnp.asarray(gids), jnp.asarray(tids), 10,
        tile=tile,
    )
    match2 = bool(np.array_equal(np.asarray(r_p2), np.asarray(r_x2)))
    log(f"int8 IVF pallas-vs-xla rows match: {match2}")
    if not match2:
        log(f"  pallas[0]: {np.asarray(r_p2)[0]}")
        log(f"  xla[0]:    {np.asarray(r_x2)[0]}")


def int8mxu(rows: int) -> None:
    """A/B the int8 score matmul inside the streaming top-k kernel:
    widened (int8 tiles cast to f32 in VMEM, bf16 MXU passes) vs native
    int8 x int8 -> int32 systolic passes (v5e: 2x the bf16 rate).

    MEASURED: ~4% device-time win, bit-identical rankings (two sessions:
    8.06 -> 7.73 ms, 13.46 -> 12.09 ms on 2.8 GiB).  The pre-probe
    roofline blamed the widened dot (M padded 32->128, ~1.0 us/tile vs
    ~0.94 us DMA); the measurement shows the dot is minor — the
    dtype-independent per-tile cost is the VPU mask chain + merge (see
    --probe maskgate for that A/B).  Rankings must be bit-identical
    (int32 accumulation is exact; |score| <= 127*127*384 < 2^24 so the
    f32 cast is too).
    """
    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.ops.topk import masked_topk_pallas

    floor = rpc_floor()
    ch = min(1_310_720, max(2048, rows))
    n = max(2048, (rows // ch) * ch)
    emb, codes = _device_corpus(n, dtype="int8")
    log(f"corpus {emb.nbytes / 2**30:.2f} GiB int8 on device")
    b = 32
    qs = []
    for it in range(12):
        q = jax.random.normal(jax.random.PRNGKey(100 + it), (b, 384), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        qs.append(jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8))
    qf = jnp.stack(
        [jnp.arange(b, dtype=jnp.int32) % 8, jnp.full((b,), -1, jnp.int32)],
        axis=1,
    )

    # bitwise gate first: same query, both paths
    s_w, r_w = masked_topk_pallas(
        qs[0], emb, codes, qf, n, 10, tile=2048, int8_mxu=False
    )
    s_m, r_m = masked_topk_pallas(
        qs[0], emb, codes, qf, n, 10, tile=2048, int8_mxu=True
    )
    ids_eq = bool(np.array_equal(np.asarray(r_w), np.asarray(r_m)))
    sc_eq = bool(np.array_equal(np.asarray(s_w), np.asarray(s_m)))
    log(f"int8mxu bitwise gate: ids_equal={ids_eq} scores_equal={sc_eq}")
    if not ids_eq:
        log(f"  widened[0]: {np.asarray(r_w)[0]}")
        log(f"  int8mxu[0]: {np.asarray(r_m)[0]}")

    gib = emb.nbytes / 2**30
    for name, flag in (("widened", False), ("int8-mxu", True)):
        ts = []
        for it in range(1, 12):
            t0 = time.time()
            _, r = masked_topk_pallas(
                qs[it], emb, codes, qf, n, 10, tile=2048, int8_mxu=flag
            )
            np.asarray(r)
            ts.append((time.time() - t0) * 1e3)
        p50 = float(np.percentile(ts, 50))
        dev_ms = max(p50 - floor, 1e-3)
        log(
            f"{name}: p50 {p50:.2f} ms/batch{b} wall | device ~{dev_ms:.2f} ms"
            f" => ~{gib / (dev_ms / 1e3):.0f} GiB/s"
        )


def maskgate(rows: int) -> None:
    """INTERLEAVED A/B of the merge gate in the streaming top-k kernel:
    eager (mask every tile, gate on masked max) vs lazy (gate on raw max,
    mask only improving tiles).  The tunneled chip drifts several ms
    between processes, so the two variants alternate call-by-call inside
    one process and each sample is paired — the only A/B methodology
    that resolves sub-ms kernel deltas on this rig.

    Runs both a wildcard-filter and a 1/8-ticker-filter query set: the
    lazy gate's risk case is selective filters (raw max >> masked kth
    best => extra merges), the win case is the steady-state VPU mask
    chain it skips.
    """
    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.ops.topk import masked_topk_pallas

    floor = rpc_floor()
    ch = min(1_310_720, max(2048, rows))
    n = max(2048, (rows // ch) * ch)
    emb, codes = _device_corpus(n, dtype="int8")
    log(f"corpus {emb.nbytes / 2**30:.2f} GiB int8 on device")
    b = 32
    qs = []
    for it in range(26):
        q = jax.random.normal(jax.random.PRNGKey(200 + it), (b, 384), jnp.float32)
        q = q / jnp.linalg.norm(q, axis=1, keepdims=True)
        qs.append(jnp.clip(jnp.round(q * 127.0), -127, 127).astype(jnp.int8))
    qf_sel = jnp.stack(
        [jnp.arange(b, dtype=jnp.int32) % 8, jnp.full((b,), -1, jnp.int32)],
        axis=1,
    )
    qf_wild = jnp.full((b, 2), -1, jnp.int32)

    for fname, qf in (("wildcard", qf_wild), ("ticker-1/8", qf_sel)):
        # bitwise gate + warm both programs
        s_e, r_e = masked_topk_pallas(
            qs[0], emb, codes, qf, n, 10, tile=2048, lazy_mask=False
        )
        s_l, r_l = masked_topk_pallas(
            qs[0], emb, codes, qf, n, 10, tile=2048, lazy_mask=True
        )
        ok = bool(np.array_equal(np.asarray(r_e), np.asarray(r_l))) and bool(
            np.array_equal(np.asarray(s_e), np.asarray(s_l))
        )
        log(f"[{fname}] eager-vs-lazy bitwise identical: {ok}")
        te, tl = [], []
        for it in range(1, 26):
            t0 = time.time()
            np.asarray(masked_topk_pallas(
                qs[it], emb, codes, qf, n, 10, tile=2048, lazy_mask=False
            )[1])
            te.append((time.time() - t0) * 1e3)
            t0 = time.time()
            np.asarray(masked_topk_pallas(
                qs[it], emb, codes, qf, n, 10, tile=2048, lazy_mask=True
            )[1])
            tl.append((time.time() - t0) * 1e3)
        pe = float(np.percentile(te, 50))
        plz = float(np.percentile(tl, 50))
        gib = emb.nbytes / 2**30
        log(
            f"[{fname}] eager p50 {pe:.2f} ms (dev ~{max(pe-floor,1e-3):.2f},"
            f" ~{gib/max(pe-floor,1e-3)*1e3:.0f} GiB/s) | "
            f"lazy p50 {plz:.2f} ms (dev ~{max(plz-floor,1e-3):.2f},"
            f" ~{gib/max(plz-floor,1e-3)*1e3:.0f} GiB/s) | "
            f"paired median delta {float(np.median(np.array(te)-np.array(tl))):+.2f} ms"
        )


def hnsw_profile(rows: int, m: int = 16, efc: int = 100) -> None:
    """Recall@15-vs-steps and latency for the device HNSW walk at scale,
    against the exact flat scan — the data that sets the steps/frontier
    defaults in index/hnsw.py (VERDICT.md round-1 item 5).  ``m``/``efc``
    vary the GRAPH richness: the 1M recall ceiling is build-bound."""
    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.index.hnsw import hnsw_walk
    from financial_rag_system_tpu.native.hnsw_loader import build_hnsw_graph
    from financial_rag_system_tpu.ops.topk import masked_topk_pallas

    floor = rpc_floor()
    rng = np.random.default_rng(0)
    d, k, b = 384, 15, 32

    # clustered corpus (ANN recall is only meaningful with structure).
    # noise is scaled so |noise| ~ 0.6 against unit centers (per-dim std
    # sigma*sqrt(d) is the vector norm): intra-cluster cosine ~0.85,
    # cross-cluster ~0 — the geometry of real topic-clustered embeddings.
    # (A per-dim std of 0.25 would give |noise| ~ 4.9, i.e. essentially
    # uniform random data, where ANN recall is meaningless.)
    n_centers = max(64, rows // 1024)
    centers = rng.standard_normal((n_centers, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    v = centers[rng.integers(0, n_centers, rows)]
    v = v + 0.03 * rng.standard_normal((rows, d)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)

    # the native build is single-threaded and ~35 min at 1M rows; the
    # corpus is deterministic (seeded rng above), so cache the graph
    cache = (f"/tmp/hnsw_graph_cache_{rows}.npz" if (m, efc) == (16, 100)
             else f"/tmp/hnsw_graph_cache_{rows}_m{m}e{efc}.npz")
    if os.path.exists(cache):
        data = np.load(cache)
        adj, entries = data["adj"], data["entries"]
        log(f"graph cache hit: {cache}")
    else:
        t0 = time.time()
        graph = build_hnsw_graph(v, m=m, ef_construction=efc, seed=0,
                                 entries_cap=32)
        if graph is None:
            raise SystemExit("native HNSW builder unavailable (g++ missing?)")
        adj, entries = graph
        log(f"native build: {rows} rows in {time.time()-t0:.0f}s")
        np.savez(cache, adj=adj, entries=entries)

    emb = jnp.asarray(v, jnp.bfloat16)
    codes = jnp.zeros((2, rows), jnp.int32)
    adj_np = np.where(adj < 0, rows, adj).astype(np.int32)
    adj_pad = jnp.asarray(np.concatenate(
        [adj_np, np.full((1, adj_np.shape[1]), rows, np.int32)]
    ))
    jentries = jnp.asarray(entries, jnp.int32)

    # queries: perturbed corpus points (realistic same-topic lookups)
    qrows = rng.integers(0, rows, b)
    q = v[qrows] + 0.02 * rng.standard_normal((b, d)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    jq = jnp.asarray(q)
    qf = jnp.full((b, 2), -1, jnp.int32)

    # ground truth + flat-scan latency baseline (the tier to beat)
    tile = 2048 if rows % 2048 == 0 else 1024
    exact_s, exact_i = masked_topk_pallas(
        jq.astype(jnp.bfloat16), emb, codes, qf, rows, k, tile=tile
    )
    exact = np.asarray(exact_i)
    ts = []
    for _ in range(6):
        t0 = time.time()
        np.asarray(masked_topk_pallas(
            jq.astype(jnp.bfloat16), emb, codes, qf, rows, k, tile=tile
        )[1])
        ts.append((time.time() - t0) * 1e3)
    flat_p50 = float(np.percentile(ts, 50))
    log(f"flat scan p50 {flat_p50:.2f} ms/batch{b} "
        f"(device ~{max(flat_p50-floor,0):.2f} ms)")

    # single-query latency at the serving default (the regime HNSW is
    # FOR — flat wins batched workloads at these scales)
    q1, qf1 = jq[:1], qf[:1]
    np.asarray(hnsw_walk(
        q1, qf1, emb, codes, adj_pad, jentries, k,
        ef=64, steps=16, frontier=8, pad_id=rows,
    )[1])
    ts = []
    for _ in range(8):
        t0 = time.time()
        np.asarray(hnsw_walk(
            q1, qf1, emb, codes, adj_pad, jentries, k,
            ef=64, steps=16, frontier=8, pad_id=rows,
        )[1])
        ts.append((time.time() - t0) * 1e3)
    p50_1 = float(np.percentile(ts, 50))
    log(f"single-query walk (steps=16 frontier=8): p50 {p50_1:.2f} ms "
        f"(device ~{max(p50_1-floor,0):.2f} ms)")

    # each (steps, frontier) pair is its own jit compile (~30 s on the
    # tunnel), so the sweep is deliberately small
    for frontier, steps_list in ((4, (4, 8, 16, 32)), (8, (8, 16))):
        for steps in steps_list:
            wi = hnsw_walk(
                jq, qf, emb, codes, adj_pad, jentries, k,
                ef=64, steps=steps, frontier=frontier, pad_id=rows,
            )[1]
            np.asarray(wi)  # compile+exec before timing
            ts = []
            for _ in range(6):
                t0 = time.time()
                np.asarray(hnsw_walk(
                    jq, qf, emb, codes, adj_pad, jentries, k,
                    ef=64, steps=steps, frontier=frontier, pad_id=rows,
                )[1])
                ts.append((time.time() - t0) * 1e3)
            got = np.asarray(wi)
            recall = np.mean([
                len(set(got[i]) & set(exact[i])) / k for i in range(b)
            ])
            p50 = float(np.percentile(ts, 50))
            log(f"steps={steps:3d} frontier={frontier} | recall@15 "
                f"{recall:.3f} | p50 {p50:.2f} ms/batch{b} "
                f"(device ~{max(p50-floor,0):.2f} ms)")

    # routed walk: k-center entry pool seeding at serving defaults (the
    # round-3 learned-embedding routing fix — index/hnsw.py).  On this
    # synthetic clustered corpus it measures whether pool seeds lift the
    # build-bound recall ceiling without a richer (m=24/efc=200) graph.
    from financial_rag_system_tpu.index.hnsw import (
        hnsw_routed_walk,
        kcenter_rows,
        pool_size_for,
    )

    pool_n = pool_size_for(rows)
    t0 = time.time()
    pool_rows_dev, _tau = kcenter_rows(emb, jnp.int32(rows), pool=pool_n)
    np.asarray(pool_rows_dev)
    log(f"k-center pool: {pool_n} rows in {time.time()-t0:.1f}s")
    take = min(32, pool_n)

    def routed():
        return hnsw_routed_walk(
            jq, qf, emb, codes, adj_pad, jentries, pool_rows_dev,
            None, None, None, k,
            ef=max(64, take + 32), steps=16, frontier=8, pad_id=rows,
            take=take,
        )

    got = np.asarray(routed()[1])
    recall = np.mean([
        len(set(got[i]) & set(exact[i])) / k for i in range(b)
    ])
    ts = []
    for _ in range(6):
        t0 = time.time()
        np.asarray(routed()[1])
        ts.append((time.time() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    log(f"ROUTED steps=16 frontier=8 take={take} | recall@15 "
        f"{recall:.3f} | p50 {p50:.2f} ms/batch{b} "
        f"(device ~{max(p50-floor,0):.2f} ms)")


def flash_gate(pairs: int = 512, seq: int = 256) -> None:
    """Validate + time the flash-attention cross-encoder path on chip.

    Correctness: MiniLM-architecture cross_score with RAG_TPU_FLASH on
    vs the naive materialized-softmax path must agree to bf16 tolerance
    on ragged-masked inputs.  Performance: p50 of the (pairs, seq)
    rerank forward both ways — the stage that dominates the fused batch
    (bench.py MFU split).
    """
    import os

    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.models import bert

    rng = np.random.default_rng(0)
    params = bert.init_params(jax.random.PRNGKey(1), bert.MINILM_L6_CROSS)
    ids = rng.integers(103, 30000, (pairs, seq)).astype(np.int32)
    lens = rng.integers(seq // 4, seq, pairs)
    mask = (np.arange(seq)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask
    types = np.zeros_like(ids)
    types[:, seq // 2:] = 1
    j = (jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask))

    def run(flash: bool):
        os.environ["RAG_TPU_FLASH"] = "1" if flash else "0"
        # the env gate is read at TRACE time and cross_score's jit cache
        # would otherwise serve the previous run's program
        bert.cross_score.clear_cache()
        fn = jax.jit(
            lambda p, i, t, m: bert.cross_score(
                p, i, t, m, bert.MINILM_L6_CROSS
            )
        )
        out = np.asarray(fn(params, *j))
        ts = []
        for _ in range(10):
            t0 = time.time()
            np.asarray(fn(params, *j))
            ts.append((time.time() - t0) * 1e3)
        return out, float(np.percentile(ts, 50))

    naive, t_naive = run(False)
    flash, t_flash = run(True)
    err = np.max(np.abs(naive - flash))
    log(f"flash vs naive cross_score: max|diff|={err:.4e} "
        f"(logit scale ~{np.std(naive):.3f})")
    log(f"rerank fwd ({pairs}x{seq}): naive p50 {t_naive:.2f} ms | "
        f"flash p50 {t_flash:.2f} ms ({t_naive/t_flash:.2f}x)")
    assert err < 0.05 * max(1.0, float(np.std(naive))), "flash mismatch"


def bf16act_gate(pairs: int = 512, seq: int = 128) -> None:
    """A/B the encoder activation dtype on chip (RAG_TPU_BF16_ACT).

    The rerank forward is HBM-bound on its inter-op activations; storing
    them bf16 (matmul accumulation and LN/softmax math stay f32) should
    cut its device time materially.  Correctness: logits must agree with
    the f32-activation forward within bf16 rounding of the logit scale.
    Interleaved timing so tunnel drift cancels.
    """
    import os

    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.models import bert

    rng = np.random.default_rng(0)
    params = bert.init_params(jax.random.PRNGKey(1), bert.MINILM_L6_CROSS)
    ids = rng.integers(103, 30000, (pairs, seq)).astype(np.int32)
    lens = rng.integers(seq // 4, seq, pairs)
    mask = (np.arange(seq)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask
    types = np.zeros_like(ids)
    types[:, seq // 2:] = 1
    j = (jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask))

    def build(flag: str):
        os.environ["RAG_TPU_BF16_ACT"] = flag
        bert.cross_score.clear_cache()  # env gate is read at trace time
        fn = jax.jit(
            lambda p, i, t, m: bert.cross_score(
                p, i, t, m, bert.MINILM_L6_CROSS
            )
        )
        out = np.asarray(fn(params, *j))  # compile + warm
        return fn, out

    fn32, out32 = build("0")
    fn16, out16 = build("1")
    os.environ.pop("RAG_TPU_BF16_ACT", None)
    err = np.max(np.abs(out32 - out16))
    scale = float(np.std(out32))
    log(f"bf16-act vs f32-act logits: max|diff|={err:.4e} "
        f"(logit scale ~{scale:.3f})")
    t32, t16 = [], []
    for _ in range(12):  # interleaved: tunnel drift hits both arms
        t0 = time.time()
        np.asarray(fn32(params, *j))
        t32.append((time.time() - t0) * 1e3)
        t0 = time.time()
        np.asarray(fn16(params, *j))
        t16.append((time.time() - t0) * 1e3)
    p32, p16 = np.percentile(t32, 50), np.percentile(t16, 50)
    log(f"rerank fwd ({pairs}x{seq}): f32-act p50 {p32:.2f} ms | bf16-act "
        f"p50 {p16:.2f} ms ({p32/p16:.2f}x)  [min {min(t32):.2f} / "
        f"{min(t16):.2f}]")
    assert err < 0.08 * max(1.0, scale), "bf16-act mismatch"


def int8rerank_gate(pairs: int = 480, seq: int = 128) -> None:
    """A/B the int8-PTQ rerank forward on chip (RAG_TPU_INT8_RERANK).

    bert.quantize_params turns the six encoder matmul stacks int8 with
    per-output-channel scales; encode() runs them weight-only (bf16
    matmul of the upcast weights, dequant folded into the output).
    History: the first variant did full dynamic activation quantization
    (int8 x int8 -> int32 on the MXU) and measured **0.88x** here — the
    per-token abs-max/round/clip passes cost more than the 2x int8 MXU
    peak returned at 480x128 pairs; weight-only keeps the 4x weight
    memory cut at parity speed.  Gates: the quantized logits must
    preserve the f32 forward's pair ORDERING (that is what rerank
    consumes — reference selection rule main.py:241-247), and the
    speedup is reported from interleaved timing so tunnel drift cancels.
    """
    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.models import bert

    rng = np.random.default_rng(0)
    params = bert.init_params(jax.random.PRNGKey(1), bert.MINILM_L6_CROSS)
    qparams = bert.quantize_params(params)
    ids = rng.integers(103, 30000, (pairs, seq)).astype(np.int32)
    lens = rng.integers(seq // 4, seq, pairs)
    mask = (np.arange(seq)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask
    types = np.zeros_like(ids)
    types[:, seq // 2:] = 1
    j = (jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask))

    fn = jax.jit(
        lambda p, i, t, m: bert.cross_score(p, i, t, m, bert.MINILM_L6_CROSS)
    )
    out32 = np.asarray(fn(params, *j))   # compile + warm (f32 variant)
    out8 = np.asarray(fn(qparams, *j))   # separate trace (int8 leaves)
    # rank agreement without scipy: Spearman via argsort ranks
    r32 = np.argsort(np.argsort(-out32))
    r8 = np.argsort(np.argsort(-out8))
    rho = float(np.corrcoef(r32, r8)[0, 1])
    err = float(np.max(np.abs(out32 - out8)))
    scale = float(np.std(out32))
    log(f"int8 vs f32 rerank logits: max|diff|={err:.4e} "
        f"(scale ~{scale:.3f}), rank Spearman rho={rho:.4f}")
    t32, t8 = [], []
    for _ in range(12):
        t0 = time.time()
        np.asarray(fn(params, *j))
        t32.append((time.time() - t0) * 1e3)
        t0 = time.time()
        np.asarray(fn(qparams, *j))
        t8.append((time.time() - t0) * 1e3)
    p32, p8 = np.percentile(t32, 50), np.percentile(t8, 50)
    log(f"rerank fwd ({pairs}x{seq}): f32 p50 {p32:.2f} ms | int8 "
        f"p50 {p8:.2f} ms ({p32/p8:.2f}x)  [min {min(t32):.2f} / "
        f"{min(t8):.2f}]")
    assert rho > 0.98, "int8 rerank ordering diverged"


def rerank_profile(pairs: int = 480, seq: int = 112) -> None:
    """Attribute the rerank stage's device time at the SERVING shape.

    The fused batch is ~84% cross-encoder (BENCH_r03 split: 18.79 of
    22.4 ms) at 28.6% MFU — this probe names where the other ~71% of MXU
    cycles go, replacing the r3 A/B guesswork (VERDICT r3 next #1):

      1. isolated-matmul roofline: chained (R,384)x(384,384) and
         FFN-shaped matmuls — the MXU ceiling XLA reaches at these exact
         shapes (if this is low, the shape itself caps the stage);
      2. layer sweep L in {1..6}: marginal per-layer cost (embedding/
         head overhead falls out of the difference);
      3. component ablations at L=6 (one toggle each, same trace
         skeleton): no-attention (QK^T/softmax/ctx replaced by identity),
         no-layernorm, no-gelu, matmul-only (all three off) — the
         difference from the full forward prices each VPU/memory
         component.

    All timings interleave against an rpc-floor op and report
    floor-subtracted device ms + implied TFLOP/s against the variant's
    own FLOPs.
    """
    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.models import bert

    rng = np.random.default_rng(0)
    floor, jitter = rpc_floor(with_jitter=True)
    r = pairs * seq
    h, inter, layers, heads = 384, 1536, 6, 12
    hd = h // heads
    kind = jax.devices()[0].device_kind.lower()
    peak = 197e12 if ("v5 lite" in kind or "v5e" in kind) else 275e12

    def timed(fn, *args, n=10):
        # np.asarray readback, never block_until_ready: the axon plugin's
        # block_until_ready can return early (documented rig behavior)
        np.asarray(fn(*args))
        ts = []
        for _ in range(n):
            t0 = time.time()
            np.asarray(fn(*args))
            ts.append((time.time() - t0) * 1e3)
        return max(float(np.percentile(ts, 50)) - floor, 1e-3)

    def rate(fl, t):
        # a subtracted time inside the floor's own jitter band is not a
        # device measurement — refuse to print an implied TFLOP/s from
        # it (an earlier revision printed ">100% of peak" here)
        if t <= max(3.0 * jitter, 1.0):
            return (f"≤ {max(t, 0.0):.2f} ms, within tunnel jitter "
                    f"(rate unresolved; theory {fl/peak*1e3:.2f} ms at peak)")
        return f"{fl/t/1e9:.1f} TFLOP/s ({100*(fl/(t/1e3))/peak:.1f}% of peak)"

    # --- 1. isolated matmul roofline ------------------------------------
    w_sq = jnp.asarray(rng.standard_normal((h, h)), jnp.bfloat16)
    w_up = jnp.asarray(rng.standard_normal((h, inter)), jnp.bfloat16)
    w_dn = jnp.asarray(rng.standard_normal((inter, h)), jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((r, h)), jnp.bfloat16)
    # square chain: 96 reps so the theoretical device time (~7.7 ms at
    # peak) clears the tunnel's jitter band — at 24 it was ~1.9 ms,
    # unresolvable behind a ~25-30 ms floor
    reps_sq, reps = 96, 24

    @jax.jit
    def chain_sq(x):
        def body(y, _):
            y = jnp.dot(y, w_sq, preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, None, length=reps_sq)
        return y.sum()

    @jax.jit
    def chain_ffn(x):
        def body(y, _):
            u = jnp.dot(y, w_up, preferred_element_type=jnp.float32)
            y = jnp.dot(u.astype(jnp.bfloat16), w_dn,
                        preferred_element_type=jnp.float32)
            return y.astype(jnp.bfloat16), None
        y, _ = jax.lax.scan(body, x, None, length=reps)
        return y.sum()

    t = timed(chain_sq, x0)
    fl = 2.0 * r * h * h * reps_sq
    log(f"matmul roofline ({r}x{h})x({h}x{h}) x{reps_sq}: {t:.2f} ms "
        f"device = {rate(fl, t)}")
    t = timed(chain_ffn, x0)
    fl = 2.0 * r * h * inter * 2 * reps
    log(f"matmul roofline FFN pair ({h}->{inter}->{h}) x{reps}: {t:.2f} ms "
        f"device = {rate(fl, t)}")

    # --- shared inputs at the serving shape ------------------------------
    ids = rng.integers(103, 30000, (pairs, seq)).astype(np.int32)
    lens = rng.integers(seq // 2, seq, pairs)
    mask = (np.arange(seq)[None, :] < lens[:, None]).astype(np.int32)
    ids = ids * mask
    types = np.zeros_like(ids)
    types[:, 32:] = 1
    j = (jnp.asarray(ids), jnp.asarray(types), jnp.asarray(mask))

    def mm_flops(n_layers):
        per = 4 * h * h + 2 * h * inter
        return 2.0 * (n_layers * per + h * h + h) * r

    def attn_flops(n_layers):
        return 4.0 * n_layers * pairs * seq * seq * h

    # --- 2. layer sweep ---------------------------------------------------
    prev = None
    for nl in (1, 2, 4, 6):
        cfg = bert.BertConfig(layers=nl, with_pooler=True, num_labels=1)
        params = bert.init_params(jax.random.PRNGKey(1), cfg)
        fn = jax.jit(functools.partial(
            lambda p, i, t_, m, c: bert.cross_score(p, i, t_, m, c), c=cfg
        ))
        tms = timed(fn, params, *j)
        fl = mm_flops(nl) + attn_flops(nl)
        marg = f" | marginal {(tms - prev[0]) / (nl - prev[1]):.2f} ms/layer" \
            if prev else ""
        log(f"cross fwd L={nl} ({pairs}x{seq}): {tms:.2f} ms device = "
            f"{rate(fl, tms)}{marg}")
        prev = (tms, nl)

    # --- 3. component ablations at L=6 ------------------------------------
    cfg = bert.BertConfig(layers=layers, with_pooler=True, num_labels=1)
    params = bert.init_params(jax.random.PRNGKey(1), cfg)

    def fwd(p, i, t_, m, *, attn=True, ln=True, gelu=True):
        emb = p["embeddings"]
        x = (emb["word"][i] + emb["position"][:seq][None]
             + emb["type"][t_])
        x = bert._ln(x, emb["ln_scale"], emb["ln_bias"], cfg.ln_eps) \
            if ln else x
        bias = jnp.where(m[:, None, None, :] > 0, 0.0, -1e9)
        inv = 1.0 / (hd ** 0.5)

        def mln(y, s, b_):
            return bert._ln(y, s, b_, cfg.ln_eps) if ln else y

        def layer(hid, lp):
            q = bert._matmul(hid, lp["q_w"], lp["q_b"])
            k = bert._matmul(hid, lp["k_w"], lp["k_b"])
            v = bert._matmul(hid, lp["v_w"], lp["v_b"])
            if attn == "flash":
                ctx = bert._flash_attention(
                    q.reshape(pairs, seq, heads, hd).astype(jnp.bfloat16),
                    k.reshape(pairs, seq, heads, hd).astype(jnp.bfloat16),
                    v.reshape(pairs, seq, heads, hd).astype(jnp.bfloat16),
                    m, inv,
                )
            elif attn:
                qh = q.reshape(pairs, seq, heads, hd)
                kh = k.reshape(pairs, seq, heads, hd)
                vh = v.reshape(pairs, seq, heads, hd)
                lg = jnp.einsum(
                    "bqhd,bkhd->bhqk", qh.astype(jnp.bfloat16),
                    kh.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ) * inv + bias
                pr = jax.nn.softmax(lg, axis=-1)
                ctx = jnp.einsum(
                    "bhqk,bkhd->bqhd", pr.astype(jnp.bfloat16),
                    vh.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32,
                ).reshape(pairs, seq, h)
            else:
                ctx = q + k + v  # keep all three matmuls live, no attn
            ao = bert._matmul(ctx, lp["o_w"], lp["o_b"])
            hid = mln(hid + ao, lp["attn_ln_scale"], lp["attn_ln_bias"])
            up = bert._matmul(hid, lp["in_w"], lp["in_b"])
            up = jax.nn.gelu(up, approximate=True) if gelu else up
            mlp = bert._matmul(up, lp["out_w"], lp["out_b"])
            hid = mln(hid + mlp, lp["mlp_ln_scale"], lp["mlp_ln_bias"])
            return hid.astype(jnp.float32), None

        x, _ = jax.lax.scan(layer, x.astype(jnp.float32), p["layers"])
        pooled = jnp.tanh(bert._matmul(
            x[:, 0, :], p["pooler"]["w"], p["pooler"]["b"]))
        return bert._matmul(
            pooled, p["classifier"]["w"], p["classifier"]["b"])[:, 0].sum()

    base_fl = mm_flops(layers) + attn_flops(layers)
    variants = [
        ("full (reimpl)", dict(), base_fl),
        ("no-attention", dict(attn=False), mm_flops(layers)),
        ("no-layernorm", dict(ln=False), base_fl),
        ("no-gelu", dict(gelu=False), base_fl),
        ("matmul-only", dict(attn=False, ln=False, gelu=False),
         mm_flops(layers)),
    ]
    try:  # fused (never-materialized) attention via the pallas ops kernel
        from jax.experimental.pallas.ops.tpu import flash_attention  # noqa
        variants.insert(1, ("flash-attn", dict(attn="flash"), base_fl))
    except Exception:
        pass
    t_full = None
    for name, kw, fl in variants:
        fn = jax.jit(functools.partial(fwd, **kw))
        try:
            tms = timed(fn, params, *j)
        except Exception as exc:
            log(f"{name:14s}: failed ({type(exc).__name__}: {exc})")
            continue
        if t_full is None:
            t_full = tms
        log(f"{name:14s}: {tms:.2f} ms device = {rate(fl, tms)}"
            + (f" | saves {t_full - tms:.2f} ms" if name != "full (reimpl)"
               else ""))

    # --- 4. the REAL serving forward, env-gated variants -------------------
    # bert.encode reads its gates at trace time; a fresh python fn object
    # per env setting forces a fresh trace.  seq padded to 128 for the
    # flash arms (the fused pipeline pads the pair length when flash
    # engages — ops/fused_query.py), so those FLOPs are the 128 ones.
    def bert_cross(p, i, t_, m):
        hh = bert.encode(p, i, t_, m, cfg)
        pooled = jnp.tanh(bert._matmul(
            hh[:, 0, :], p["pooler"]["w"], p["pooler"]["b"]))
        return bert._matmul(
            pooled, p["classifier"]["w"], p["classifier"]["b"])[:, 0]

    sflash = ((seq + 127) // 128) * 128  # flash block multiple ≥ seq
    ids128 = np.zeros((pairs, sflash), np.int32)
    ids128[:, :seq] = ids
    mask128 = np.zeros((pairs, sflash), np.int32)
    mask128[:, :seq] = mask
    types128 = np.zeros((pairs, sflash), np.int32)
    types128[:, 32:] = mask128[:, 32:]
    j128 = tuple(map(jnp.asarray, (ids128, types128, mask128)))

    def fl_at(s):
        per = 4 * h * h + 2 * h * inter
        return (2.0 * (layers * per + h * h + h) * pairs * s
                + 4.0 * layers * pairs * s * s * h)

    out_ref = None
    for name, env, jj, fl in (
        ("bert XLA graph",
         {"RAG_TPU_FUSED_BLOCK": "0", "RAG_TPU_PAIR_ATTN": "0"}, j,
         fl_at(seq)),
        ("bert pair-attn",
         {"RAG_TPU_FUSED_BLOCK": "0", "RAG_TPU_PAIR_ATTN": "1"}, j,
         fl_at(seq)),
        ("bert fused-blk",
         {"RAG_TPU_FUSED_BLOCK": "1", "RAG_TPU_PAIR_ATTN": "0"}, j,
         fl_at(seq)),
        (f"bert fused+fl{sflash}",
         {"RAG_TPU_FUSED_BLOCK": "1", "RAG_TPU_FLASH": "1",
          "RAG_TPU_PAIR_ATTN": "0"}, j128, fl_at(sflash)),
        (f"bert xla+fl{sflash}",
         {"RAG_TPU_FUSED_BLOCK": "0", "RAG_TPU_FLASH": "1",
          "RAG_TPU_PAIR_ATTN": "0"}, j128, fl_at(sflash)),
    ):
        old = {k: os.environ.get(k) for k in env}
        os.environ.update(env)
        try:
            fn = jax.jit(lambda p, i, t_, m: bert_cross(p, i, t_, m))
            tms = timed(fn, params, *jj)
            out = np.asarray(fn(params, *jj))
            if out_ref is None:
                out_ref = out
                agree = ""
            else:
                agree = (f" | max|dlogit| {np.max(np.abs(out - out_ref)):.4f}"
                         if out.shape == out_ref.shape else "")
            log(f"{name:16s}: {tms:.2f} ms device = {rate(fl, tms)}{agree}")
        except Exception as exc:
            log(f"{name:16s}: failed ({type(exc).__name__}: {exc})")
        finally:
            for k, val in old.items():
                if val is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = val


def dispatch_gate(rows: int = 131_072) -> None:
    """Price the sustained-throughput methodology itself.

    BENCH_r03 sustained is 22.4 ms/batch while the r4 rerankprof puts
    the fused batch's device work at ~14.5 ms — is the ~8 ms gap device
    time the split missed, or host-side serialization in how
    ``utils/timing.concurrent_ms`` overlaps calls (it dispatches in the
    CALLER's thread and only threads the fetches)?  Four measurements of
    the SAME fused serving program at the serving shape (B=32, k=15,
    DLEN 80, synthetic on-device corpus — no tunnel uploads):

      1. single-call p50 incl. readback (the lone-request view);
      2. ``concurrent_ms`` exactly as bench.py uses it (workers=8,
         reps=24; dispatch serial in the caller);
      3. dispatch-threaded variant: dispatch AND fetch both inside the
         worker pool, sweep workers in {4, 8, 16};
      4. dispatch-only serial cost: N back-to-back dispatches with one
         trailing fetch (what each enqueue RPC costs the caller).

    If (3) beats (2) beyond jitter, the sustained number is dispatch-
    bound and the bench methodology undersells the chip; fold the
    threaded-dispatch mode into utils/timing and re-measure.
    """
    import jax
    import jax.numpy as jnp

    from financial_rag_system_tpu.models import bert
    from financial_rag_system_tpu.ops.fused_query import make_fused_query
    from financial_rag_system_tpu.utils.timing import concurrent_ms

    B, K, DLEN, LQ = 32, 15, 80, 32
    rng = np.random.default_rng(0)
    floor, jitter = rpc_floor(with_jitter=True)
    on_tpu = jax.devices()[0].platform == "tpu"

    eparams = bert.init_params(jax.random.PRNGKey(0), bert.BGE_SMALL)
    rparams = bert.init_params(jax.random.PRNGKey(1), bert.MINILM_L6_CROSS)

    @jax.jit
    def build():
        kk = jax.random.PRNGKey(2)
        emb = jax.random.normal(kk, (rows, 384), jnp.float32)
        emb = (emb / jnp.linalg.norm(emb, axis=1, keepdims=True)).astype(
            jnp.bfloat16)
        codes = jnp.stack([jnp.arange(rows, dtype=jnp.int32) % 8,
                           jnp.zeros((rows,), jnp.int32)])
        toks = jax.random.randint(kk, (rows, DLEN), 1000, 20000, jnp.int32)
        return emb, codes, toks

    log(f"building {rows}-row synthetic corpus on device ...")
    emb, codes, toks = map(jax.block_until_ready, build())
    q_ids = jnp.asarray(rng.integers(1000, 20000, (B, LQ)), jnp.int32)
    q_types = jnp.zeros((B, LQ), jnp.int32)
    q_mask = jnp.ones((B, LQ), jnp.int32)
    qf = jnp.stack([jnp.arange(B, dtype=jnp.int32) % 8,
                    jnp.full((B,), -1, jnp.int32)], axis=1)
    nv = jnp.asarray(rows, jnp.int32)

    fused = make_fused_query(
        bert.BGE_SMALL, bert.MINILM_L6_CROSS, k=K,
        tile=1024 if on_tpu else 128, use_pallas=on_tpu,
    )

    def call():
        return fused(eparams, rparams, q_ids, q_types, q_mask, qf,
                     emb, codes, toks, nv)

    def fetch(out):
        for leaf in jax.tree.leaves(out):
            np.asarray(leaf)

    log("warmup/compile fused pipeline ...")
    fetch(call())

    # 1. single-call view
    ts = []
    for _ in range(12):
        t0 = time.time()
        fetch(call())
        ts.append((time.time() - t0) * 1e3)
    p50 = float(np.percentile(ts, 50))
    log(f"single-call p50 {p50:.2f} ms/batch (floor {floor:.2f}, "
        f"jitter {jitter:.2f}; floor-subtracted ≈ {p50 - floor:.2f} ms)")

    # 2. bench.py's exact methodology
    cur = concurrent_ms(call, workers=8, reps=24)
    log(f"concurrent_ms (dispatch serial, fetch threaded, w=8): "
        f"{cur:.2f} ms/batch => {cur / B:.3f} ms/query")

    # 3. dispatch-threaded sweep
    from concurrent.futures import ThreadPoolExecutor

    def one():
        fetch(call())

    for w in (4, 8, 16):
        one()
        with ThreadPoolExecutor(w) as ex:
            t0 = time.time()
            futs = [ex.submit(one) for _ in range(24)]
            for f in futs:
                f.result()
            t = (time.time() - t0) / 24 * 1e3
        log(f"dispatch-threaded (w={w}): {t:.2f} ms/batch => "
            f"{t / B:.3f} ms/query")

    # 4. dispatch-only serial cost
    n = 24
    t0 = time.time()
    outs = [call() for _ in range(n)]
    t_disp = (time.time() - t0) / n * 1e3
    fetch(outs[-1])
    log(f"dispatch-only serial: {t_disp:.2f} ms/call enqueue cost "
        f"(device queue drains behind it)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--probe",
        choices=("floor", "scan", "int8", "int8mxu", "hnsw", "flash",
                 "bf16act", "int8rerank", "maskgate", "rerankprof",
                 "dispatch"),
        default="floor",
    )
    ap.add_argument("--rows", type=int, default=1_048_576)
    ap.add_argument("--dtype", choices=("bf16", "int8"), default="bf16",
                    help="corpus dtype for --probe scan")
    ap.add_argument("--m", type=int, default=16, help="HNSW build degree")
    ap.add_argument("--efc", type=int, default=100,
                    help="HNSW build ef_construction")
    ap.add_argument("--pairs", type=int, default=480,
                    help="rerank pair count for --probe rerankprof")
    ap.add_argument("--seq", type=int, default=112,
                    help="rerank pair length for --probe rerankprof "
                         "(1000-char chunks serve at ~400)")
    args = ap.parse_args()
    import jax

    from financial_rag_system_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    log(f"platform: {jax.devices()[0].platform}")
    if args.probe in ("scan", "int8", "int8mxu", "hnsw", "flash",
                      "bf16act", "int8rerank", "maskgate",
                      "rerankprof", "dispatch") and (
        jax.devices()[0].platform != "tpu"
    ):
        raise SystemExit(
            f"--probe {args.probe} needs a real TPU (compiled Pallas); "
            "interpret-mode semantics are covered by tests/test_topk.py"
        )
    if args.probe == "floor":
        rpc_floor()
    elif args.probe == "scan":
        scan(args.rows, dtype=args.dtype)
    elif args.probe == "int8":
        int8_gate(args.rows)
    elif args.probe == "int8mxu":
        int8mxu(args.rows)
    elif args.probe == "maskgate":
        maskgate(args.rows)
    elif args.probe == "flash":
        flash_gate()
    elif args.probe == "bf16act":
        bf16act_gate()
    elif args.probe == "int8rerank":
        int8rerank_gate()
    elif args.probe == "rerankprof":
        rerank_profile(args.pairs, args.seq)
    elif args.probe == "dispatch":
        # dispatch_gate's methodology assumes its own 131k default corpus,
        # not --rows' 1M default — it measures dispatch overhead, not scan
        # bandwidth, so the corpus just needs to be big enough to be real.
        dispatch_gate()
    elif args.probe == "hnsw":
        hnsw_profile(args.rows, m=args.m, efc=args.efc)
    else:
        raise SystemExit(f"unhandled probe {args.probe!r}")
