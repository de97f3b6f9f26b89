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
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def env(pid: int, port: int) -> dict:
        e = dict(os.environ)
        e.update(
            TESTING="True",
            RAG_TPU_PORT=str(port),
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
        deadline = time.time() + 120
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
        with urllib.request.urlopen(req, timeout=60) as r:
            body = json.load(r)
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
