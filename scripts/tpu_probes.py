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


def rpc_floor() -> float:
    """Round-trip of a trivial op — the per-call overhead baseline."""
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
    log(f"rpc floor p50: {floor:.2f} ms")
    return floor


def _device_corpus(n: int, d: int = 384):
    import jax
    import jax.numpy as jnp

    ch = min(1_310_720, n)
    # tile must divide n; scan() passes n as a multiple of its chunk

    @functools.partial(jax.jit, donate_argnums=0)
    def fill(buf, key, start):
        v = jax.random.normal(key, (ch, d), jnp.float32)
        v = v / jnp.linalg.norm(v, axis=1, keepdims=True)
        return jax.lax.dynamic_update_slice(
            buf, v.astype(jnp.bfloat16), (start, 0)
        )

    assert n % ch == 0, f"rows {n} must be a multiple of chunk {ch}"
    emb = jnp.zeros((n, d), jnp.bfloat16)
    for i in range(n // ch):
        emb = fill(emb, jax.random.PRNGKey(i), i * ch)
    codes = jnp.stack(
        [jnp.arange(n, dtype=jnp.int32) % 8, jnp.arange(n, dtype=jnp.int32) % 2]
    )
    jax.block_until_ready(emb)
    return emb, codes


def scan(rows: int) -> None:
    """Flat masked-top-k over `rows` corpus rows; reports device-side
    bandwidth with the RPC floor subtracted."""
    import jax.numpy as jnp

    from financial_rag_system_tpu.ops.topk import masked_topk_pallas

    floor = rpc_floor()
    ch = min(1_310_720, max(2048, rows))
    n = max(2048, (rows // ch) * ch)  # whole chunks only: no zero rows
    emb, codes = _device_corpus(n)
    log(f"corpus {emb.nbytes / 2**30:.2f} GiB on device")
    b = 32
    qs = []
    for it in range(12):
        import jax

        q = jax.random.normal(jax.random.PRNGKey(100 + it), (b, 384), jnp.float32)
        qs.append((q / jnp.linalg.norm(q, axis=1, keepdims=True)).astype(jnp.bfloat16))
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


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", choices=("floor", "scan", "int8"), default="floor")
    ap.add_argument("--rows", type=int, default=1_048_576)
    args = ap.parse_args()
    import jax

    log(f"platform: {jax.devices()[0].platform}")
    if args.probe in ("scan", "int8") and jax.devices()[0].platform != "tpu":
        raise SystemExit(
            f"--probe {args.probe} needs a real TPU (compiled Pallas); "
            "interpret-mode semantics are covered by tests/test_topk.py"
        )
    if args.probe == "floor":
        rpc_floor()
    elif args.probe == "scan":
        scan(args.rows)
    else:
        int8_gate(args.rows)
