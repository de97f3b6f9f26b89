"""Multi-host serving: 2-process jax.distributed, coordinator owns HTTP.

Subprocess integration test of parallel/distributed.py + serving/app.main:
both processes run the SAME entrypoint; jax.distributed wires them from
env vars; process 0 binds the HTTP front and serves /ask, process 1
parks (prints the worker message, binds nothing).  This is the CPU
stand-in for a DCN pod-slice deployment — the same "flag swaps the
backend, test the real control plane" philosophy as the TESTING shim
(reference tests.py:8-9).

This scenario caught a real bug once (the fused pipeline dispatching a
compiled Pallas kernel on the CPU backend), so it stays a test.
"""

import json
import os
import socket
import subprocess
import sys
import time
import urllib.request

import pytest

_RUNNER = """
import jax
jax.config.update("jax_platforms", "cpu")
from financial_rag_system_tpu.serving import app
app.main()
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_coordinator_serves_and_worker_parks(tmp_path):
    coord_port = _free_port()
    worker_port = _free_port()
    dist_port = _free_port()
    control_port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def env(pid: int, port: int) -> dict:
        e = dict(os.environ)
        e.update(
            TESTING="True",
            RAG_TPU_PORT=str(port),
            FRS_CONTROL_PORT=str(control_port),
            DATABASE_URL=str(tmp_path / "cache.db"),
            INDEX_DIR=str(tmp_path / "index"),
            JAX_COORDINATOR_ADDRESS=f"localhost:{dist_port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=repo + os.pathsep + e.get("PYTHONPATH", ""),
        )
        return e

    procs = []
    logs = [tmp_path / "coord.log", tmp_path / "worker.log"]
    try:
        for pid, port, logf in (
            (0, coord_port, logs[0]), (1, worker_port, logs[1])
        ):
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", _RUNNER],
                    env=env(pid, port),
                    stdout=open(logf, "w"),
                    stderr=subprocess.STDOUT,
                )
            )

        # coordinator must come up and answer /ask end-to-end
        deadline = time.time() + 240
        up = False
        while time.time() < deadline:
            if any(p.poll() is not None for p in procs):
                break  # a process died — fail fast below
            try:
                with urllib.request.urlopen(
                    f"http://localhost:{coord_port}/health", timeout=2
                ) as r:
                    up = r.status == 200
                    break
            except OSError:
                time.sleep(1.0)
        for p, logf in zip(procs, logs):
            assert p.poll() is None, f"process died:\n{logf.read_text()[-2000:]}"
        assert up, f"coordinator never bound:\n{logs[0].read_text()[-2000:]}"

        req = urllib.request.Request(
            f"http://localhost:{coord_port}/ask",
            data=json.dumps({"query": "revenue growth", "ticker": "AAPL"}).encode(),
            headers={"content-type": "application/json"},
        )
        # the first /ask compiles the fused batch program on BOTH
        # processes; under full-suite contention (1 CPU shared with
        # pytest) that can outlast the server's own 90 s request timeout
        # (a 504, the documented warmup behavior) — retry, don't flake
        body = None
        for attempt in range(3):
            try:
                with urllib.request.urlopen(req, timeout=180) as r:
                    body = json.load(r)
                break
            except OSError:
                if attempt == 2:
                    raise
                time.sleep(5)
        assert body["provider"] and "answer" in body

        # the worker must NOT bind its HTTP port
        with pytest.raises(OSError):
            urllib.request.urlopen(
                f"http://localhost:{worker_port}/health", timeout=2
            )
        # and must have announced it parked
        deadline = time.time() + 30
        while time.time() < deadline:
            if "worker process" in logs[1].read_text():
                break
            time.sleep(1.0)
        assert "worker process" in logs[1].read_text()
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait(timeout=10)


@pytest.mark.slow
def test_two_process_sharded_corpus_built_once(tmp_path):
    """Op-broadcast control plane (parallel/control.py): the corpus is
    ingested ONCE through the coordinator's HTTP front, shards land on
    BOTH processes' devices, and a query whose best row lives on the
    worker's shard comes back — no per-host rebuild (VERDICT.md item 6).
    """
    coord_port = _free_port()
    dist_port = _free_port()
    control_port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # 1 CPU device per process, 2 processes => 2-shard global mesh;
    # capacity 32 / tile 8 => rows [16, 32) live on the WORKER's device
    def env(pid: int) -> dict:
        e = dict(os.environ)
        e.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=1",
            TESTING="True",
            RAG_TPU_PORT=str(coord_port if pid == 0 else _free_port()),
            FRS_CONTROL_PORT=str(control_port),
            # exercise the mutual HMAC handshake on the op channel
            FRS_CONTROL_TOKEN="multihost-test-secret",
            RAG_TPU_CORPUS_TILE="8",
            RAG_TPU_MAX_CORPUS="32",
            DATABASE_URL=str(tmp_path / "cache.db"),
            INDEX_DIR=str(tmp_path / "index"),
            JAX_COORDINATOR_ADDRESS=f"localhost:{dist_port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
            PYTHONPATH=repo + os.pathsep + e.get("PYTHONPATH", ""),
        )
        return e

    def post(path: str, body: dict, timeout: float = 60):
        req = urllib.request.Request(
            f"http://localhost:{coord_port}{path}",
            data=json.dumps(body).encode(),
            headers={"content-type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=timeout) as r:
            return json.load(r)

    procs = []
    logs = [tmp_path / "coord.log", tmp_path / "worker.log"]
    try:
        for pid, logf in ((0, logs[0]), (1, logs[1])):
            procs.append(
                subprocess.Popen(
                    [sys.executable, "-c", _RUNNER],
                    env=env(pid),
                    stdout=open(logf, "w"),
                    stderr=subprocess.STDOUT,
                )
            )
        deadline = time.time() + 240
        up = False
        while time.time() < deadline and all(p.poll() is None for p in procs):
            try:
                with urllib.request.urlopen(
                    f"http://localhost:{coord_port}/health", timeout=2
                ) as r:
                    up = r.status == 200
                    break
            except OSError:
                time.sleep(1.0)
        for p, logf in zip(procs, logs):
            assert p.poll() is None, f"process died:\n{logf.read_text()[-3000:]}"
        assert up, f"coordinator never bound:\n{logs[0].read_text()[-3000:]}"

        # ingest 24 rows ONCE via the coordinator; rows 16-23 shard to
        # the worker's device
        n = 24
        body = {
            "ids": [f"d{i}" for i in range(n)],
            "texts": [f"filing chunk keyword{i} details" for i in range(n)],
            "payloads": [
                {"ticker": "AAPL", "document_type": "10-K",
                 "source_file": f"f{i}"}
                for i in range(n)
            ],
        }
        r = post("/index/upsert", body, timeout=120)
        assert r["indexed_chunks"] == n

        # multi-process serving keeps the FUSED batch path: the TESTING
        # hash stack + device token store fuse on the sharded mesh, and
        # each batch is ONE broadcast op (VERDICT r2 item 4)
        with urllib.request.urlopen(
            f"http://localhost:{coord_port}/queue_status", timeout=30
        ) as resp:
            qs = json.load(resp)
        assert qs["index_tier"] == "Broadcast[ShardedFlatIndex]", qs
        assert qs["fused_kind"] == "hash", qs

        # a query that only matches a row on the worker's shard
        r = post(
            "/ask",
            {"query": "keyword20", "ticker": "AAPL", "top_k": 3},
            timeout=120,
        )
        assert r["sources"], r
        assert "keyword20" in r["sources"][0]["text"]

        # checkpoint crosses processes (gather is a broadcast op)
        req = urllib.request.Request(
            f"http://localhost:{coord_port}/index/save",
            data=b"{}", method="POST",
            headers={"content-type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
        assert (tmp_path / "index" / "sharded_index.npz").exists()
        assert (tmp_path / "index" / "store.json").exists()

        # tier promotion is itself a broadcast op: both processes build
        # their shard's graph and the walk's collectives line up
        r = post("/index/rebuild", {"tier": "hnsw"}, timeout=240)
        assert r["tier"] == "Broadcast[ShardedHNSWIndex]", r
        r = post(
            "/ask",
            {"query": "keyword21", "ticker": "AAPL", "top_k": 3},
            timeout=120,
        )
        assert r["sources"], r
        assert "keyword21" in r["sources"][0]["text"]
        # tier-aware checkpoint: the graph stack persists alongside the
        # gathered flat arrays (and the sweep must not delete it)
        with urllib.request.urlopen(req, timeout=120) as resp:
            assert resp.status == 200
        assert (tmp_path / "index" / "sharded_hnsw_graph.npz").exists()
        assert (tmp_path / "index" / "sharded_index.npz").exists()
    finally:
        for p in procs:
            p.kill()
        for p in procs:
            p.wait(timeout=10)
