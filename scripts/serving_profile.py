"""Warm-/ask audit: where does a single trained-stack request spend time?

Launches the server (subprocess, same env), warms it, then measures:

- warm single /ask wall p50 (fresh query strings — no cache hits) and the
  per-stage breakdown from /metrics (batch wait vs fused_tokenize_ms /
  fused_device_ms / fused_assemble_ms vs LLM);
- sustained throughput at concurrency 10 via load_testing.py's harness
  against the live server.

VERDICT r4 #5: the r3 measurement (86 ms warm trained /ask vs a ~33 ms
tunnel RPC floor) had no breakdown; this names the terms.  Run with the
trained exports for the production configuration:

    RAG_TPU_BGE_DIR=... RAG_TPU_RERANKER_DIR=... \
        python scripts/serving_profile.py [--port 18811] [--n 20]

LLM_BASE_URL=http://localhost:9 makes the breaker trip instantly
(degraded answers) so no request waits on Groq timeouts.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _post(url: str, body: dict, timeout: float = 120.0) -> dict:
    req = urllib.request.Request(
        url, json.dumps(body).encode(),
        headers={"content-type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _get(url: str, timeout: float = 10.0) -> dict:
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return json.loads(r.read())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=18811)
    ap.add_argument("--n", type=int, default=20, help="warm /ask samples")
    ap.add_argument("--keep", action="store_true",
                    help="leave the server running on exit")
    ap.add_argument("--no-load", action="store_true",
                    help="skip the concurrency-10 load test")
    ap.add_argument("--ingest", type=int, default=0, metavar="N",
                    help="upsert an N-chunk synthetic corpus through "
                         "POST /index/upsert before profiling (the "
                         "production ingest path) — for servers that "
                         "start empty, e.g. the trained-stack composite")
    ap.add_argument("--ingest-hard", action="store_true",
                    help="use the hard-mode corpus for --ingest")
    ap.add_argument("--chunk-chars", type=int, default=0,
                    help="pad ingested chunks toward this many chars "
                         "(1000 = reference ingest.py shape)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the server onto the CPU backend (the "
                         "axon plugin ignores JAX_PLATFORMS, so this "
                         "launches via a jax.config wrapper) — hermetic "
                         "smoke / wedged-tunnel mode")
    args = ap.parse_args()
    base = f"http://localhost:{args.port}"

    env = dict(os.environ)
    env.setdefault("LLM_BASE_URL", "http://localhost:9")  # instant breaker
    env["RAG_TPU_PORT"] = str(args.port)
    env.setdefault("DATABASE_URL", f"/tmp/frs_profile_{args.port}.db")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if args.cpu:
        runner = f"/tmp/frs_profile_runner_{args.port}.py"
        with open(runner, "w") as f:
            f.write(
                "import jax\n"
                "jax.config.update('jax_platforms', 'cpu')\n"
                "import sys\n"
                f"sys.path.insert(0, {repo!r})\n"
                "from financial_rag_system_tpu.serving import app\n"
                "app.main()\n"
            )
        cmd = [sys.executable, runner]
    else:
        cmd = [sys.executable, "-m", "financial_rag_system_tpu.serving.app"]
    srv = subprocess.Popen(
        cmd,
        env=env, stdout=open(f"/tmp/serving_profile_{args.port}.log", "w"),
        stderr=subprocess.STDOUT, cwd=repo,
    )
    try:
        deadline = time.time() + 300
        while time.time() < deadline:
            try:
                _get(base + "/health", timeout=3)
                break
            except Exception:
                time.sleep(5)
        else:
            raise SystemExit("server never came up; see the log")
        if args.ingest:
            from financial_rag_system_tpu.data.synthetic import (
                make_corpus,
                make_hard_corpus,
            )

            maker = make_hard_corpus if args.ingest_hard else make_corpus
            ids, texts, payloads = maker(
                args.ingest, chunk_chars=args.chunk_chars or None
            )
            print(f"ingesting {len(ids)} chunks via /index/upsert ...",
                  flush=True)
            t0 = time.time()
            for i in range(0, len(ids), 1024):
                sl = slice(i, i + 1024)
                body = {"ids": list(ids[sl]), "texts": list(texts[sl]),
                        "payloads": list(payloads[sl])}
                # the first upsert pays tunnel warmup + embed compile and
                # can 504 at the server's request timeout while ingest
                # continues server-side — retry; ids make it idempotent
                for attempt in range(6):
                    try:
                        _post(base + "/index/upsert", body, timeout=600)
                        break
                    except urllib.error.HTTPError as e:
                        if e.code != 504 or attempt == 5:
                            raise
                        time.sleep(20)
                    except (urllib.error.URLError, TimeoutError):
                        if attempt == 5:
                            raise
                        time.sleep(20)
            n_idx = _get(base + "/ready").get("indexed_chunks")
            print(f"ingested in {time.time()-t0:.1f}s "
                  f"(indexed_chunks={n_idx})", flush=True)
        print("server up; warming the fused program ...", flush=True)
        t0 = time.time()
        # The first /ask routinely 504s at the server's 90 s request
        # timeout while the fused program compiles + pays the tunnel's
        # ~100 s first-readback warmup (rig fact, CLAUDE.md) — the
        # request keeps compiling server-side, so retry until one lands.
        for attempt in range(6):
            try:
                _post(base + "/ask", {"query": f"warmup {time.time()}",
                                      "ticker": "AAPL"}, timeout=240)
                break
            except urllib.error.HTTPError as e:
                if e.code != 504:
                    raise
                print(f"warmup /ask 504 (attempt {attempt + 1}; compile "
                      "still in flight server-side) — retrying", flush=True)
                if attempt < 5:
                    time.sleep(20)
            except (urllib.error.URLError, TimeoutError) as e:
                # A client-side socket timeout at the 240 s cap is the
                # same tunnel-warmup symptom as the 504 — retry it too.
                print(f"warmup /ask transport error (attempt {attempt + 1}"
                      f": {e}) — retrying", flush=True)
                if attempt < 5:
                    time.sleep(20)
        else:
            raise SystemExit("warmup /ask never completed; see the log")
        print(f"first /ask (compile+warm): {time.time()-t0:.1f}s",
              flush=True)

        walls = []
        for i in range(args.n):
            q = f"profile probe {i} {time.time()} revenue margin trend"
            t0 = time.time()
            out = _post(base + "/ask", {"query": q, "ticker": "AAPL"})
            walls.append((time.time() - t0) * 1e3)
            assert not out.get("cached")
        p50 = float(np.percentile(walls, 50))
        p95 = float(np.percentile(walls, 95))
        print(f"warm /ask wall: p50 {p50:.1f} ms  p95 {p95:.1f} ms  "
              f"min {min(walls):.1f} ms  (n={args.n})", flush=True)

        metrics = _get(base + "/metrics")
        keys = (
            "router_ms", "retrieval_ms", "fused_tokenize_ms",
            "fused_device_ms", "fused_assemble_ms", "rerank_ms",
            "llm_ms", "batch_compute_ms", "total_e2e_ms",
        )
        print("per-stage p50/p95 ms from /metrics:")
        for k in keys:
            m = metrics.get(k) or {}
            if m:
                print(f"  {k:20s} p50 {m.get('p50', 0):8.2f}   "
                      f"p95 {m.get('p95', 0):8.2f}   n {m.get('count', 0)}")

        if not args.no_load:
            print("load test (concurrency 10, 100 queries) ...", flush=True)
            t0 = time.time()
            rc = subprocess.run(
                [sys.executable, "load_testing.py", "--backend", base],
                cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                capture_output=True, text=True, timeout=1800,
            )
            tail = (rc.stdout or "").strip().splitlines()[-6:]
            print("\n".join(tail), flush=True)
            print(f"load test wall: {time.time()-t0:.1f}s", flush=True)
    finally:
        if not args.keep:
            srv.terminate()
            try:
                srv.wait(10)
            except subprocess.TimeoutExpired:
                srv.kill()


if __name__ == "__main__":
    main()
