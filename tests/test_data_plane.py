"""Chunker, ingestion (local + HTTP), scheduler."""

import asyncio
import threading
import time
from datetime import datetime, timezone

import numpy as np
from aiohttp.test_utils import TestClient, TestServer

from financial_rag_system_tpu.data.chunker import split_text
from financial_rag_system_tpu.data.ingest import (
    ChunkBatch,
    chunks_from_file,
    extract_text_from_html,
    ingest_files,
    ingest_local,
)
from financial_rag_system_tpu.data.scheduler import IngestionScheduler, next_run_at
from financial_rag_system_tpu.index.flat import FlatIndex
from financial_rag_system_tpu.models.embedder import HashEmbedder
from financial_rag_system_tpu.serving.cache import CacheDB


def test_split_text_sizes():
    text = "\n\n".join(
        " ".join(f"word{i}_{j}" for j in range(40)) for i in range(30)
    )
    chunks = split_text(text, chunk_size=1000, overlap=200)
    assert chunks
    assert all(len(c) <= 1000 for c in chunks)
    assert all(c.strip() for c in chunks)
    # overlap: consecutive chunks share trailing/leading content
    assert any(chunks[i][-50:] in chunks[i + 1] for i in range(len(chunks) - 1))


def test_split_text_hard_wrap():
    # no separators at all: must hard-wrap rather than loop forever
    chunks = split_text("x" * 5000, chunk_size=1000, overlap=200)
    assert all(len(c) <= 1000 for c in chunks)
    assert sum(len(c) for c in chunks) >= 5000  # overlap duplicates allowed


def test_split_drops_blank():
    assert split_text("\n\n \n\n  \n\n", 100, 10) == []


def test_extract_text_from_html():
    html = "<html><body><h1>Report</h1><p>Revenue was $1B.</p></body></html>"
    text = extract_text_from_html(html)
    assert "Report" in text and "Revenue was $1B." in text
    assert "<p>" not in text


def test_chunks_from_file_deterministic_ids(tmp_path):
    p = tmp_path / "filing.html"
    p.write_text("<html><body>" + "Revenue grew. " * 500 + "</body></html>")
    b1 = chunks_from_file(str(p), "AAPL", "10-K")
    b2 = chunks_from_file(str(p), "AAPL", "10-K")
    assert b1.ids == b2.ids  # idempotent re-ingestion (md5 point ids)
    assert len(set(b1.ids)) == len(b1.ids)
    assert all(pl["ticker"] == "AAPL" for pl in b1.payloads)


def test_ingest_files_and_cache_invalidation(tmp_path):
    p = tmp_path / "filing.html"
    p.write_text("<html><body>" + "Apple revenue grew strongly. " * 300 + "</body></html>")
    emb = HashEmbedder(dim=128)
    index = FlatIndex(dim=128, capacity=256, tile=128, use_pallas=False)
    cache = CacheDB(":memory:")
    cache.save("h1", "AAPL", "q", "a")
    cache.save("h2", "MSFT", "q", "a")
    n = ingest_files(index, emb, "AAPL", "10-K", [str(p)], cache=cache)
    assert n > 0
    assert index.n_valid == n
    # ticker cache invalidated, others kept (reference ingest.py:185-193)
    assert cache.lookup("h1", "AAPL") is None
    assert cache.lookup("h2", "MSFT") == "a"
    # re-ingest: no new rows
    assert ingest_files(index, emb, "AAPL", "10-K", [str(p)]) == 0


def test_http_upsert_roundtrip(tmp_path):
    from tests.test_serving import make_engine
    from financial_rag_system_tpu.serving.app import create_app

    async def t():
        engine = make_engine(tmp_path)
        app = create_app(engine)
        async with TestClient(TestServer(app)) as client:
            before = engine.index.n_valid
            batch = ChunkBatch(
                ids=["x1", "x2"],
                texts=["nvidia data center revenue", "nvidia gaming segment"],
                payloads=[
                    {"ticker": "NVDA", "document_type": "10-K", "source_file": "s"}
                ]
                * 2,
            )
            r = await client.post(
                "/index/upsert",
                json={"ids": batch.ids, "texts": batch.texts, "payloads": batch.payloads},
            )
            body = await r.json()
            assert body["new_rows"] == 2
            assert body["indexed_chunks"] == before + 2
            # now retrievable with the NVDA filter
            ask = await (
                await client.post(
                    "/ask",
                    json={"query": "data center revenue", "ticker": "NVDA"},
                )
            ).json()
            assert ask["sources"]
            assert all("nvidia" in s["text"] for s in ask["sources"])

    asyncio.run(t())


def test_scheduler_lock_skips_overlap():
    started = threading.Event()
    release = threading.Event()

    def slow_ingest(ticker, ftypes):
        started.set()
        release.wait(5)
        return 1

    sched = IngestionScheduler(slow_ingest, ["AAPL"], ["10-K"], backoff_s=0)
    t = threading.Thread(target=sched.run_job)
    t.start()
    started.wait(5)
    assert sched.run_job() is False  # overlapping trigger skipped
    release.set()
    t.join()
    assert sched.runs == 1


def test_scheduler_retries():
    calls = []

    def flaky(ticker, ftypes):
        calls.append(ticker)
        if len(calls) < 3:
            raise RuntimeError("edgar down")
        return 1

    sched = IngestionScheduler(flaky, ["AAPL"], ["10-K"], backoff_s=0.01)
    assert sched.run_job() is True
    assert len(calls) == 3  # 2 failures + success
    assert sched.failures == {}


def test_scheduler_gives_up_after_retries():
    def always_fails(ticker, ftypes):
        raise RuntimeError("nope")

    sched = IngestionScheduler(always_fails, ["AAPL"], ["10-K"], backoff_s=0.0)
    assert sched.run_job() is True
    assert sched.failures["AAPL"] == 1


def test_next_run_at():
    now = datetime(2026, 8, 16, 10, 30, tzinfo=timezone.utc)
    nxt = next_run_at(now, "11:00")
    assert nxt.hour == 11 and nxt.day == 16
    nxt = next_run_at(now, "09:00")
    assert nxt.day == 17  # already past today
