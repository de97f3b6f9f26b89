"""Concurrency load test: 100 queries against the /ask endpoint.

Same harness design as the reference (/root/reference/load_testing.py):
100 hand-written AAPL queries in 10 thematic sections, cache cleared
first so every request is live, an ``httpx.AsyncClient`` issuing them
under an ``asyncio.Semaphore(10)``, 90 s per-request timeout,
per-request CACHE HIT / LIVE + provider lines, and a summary with total
duration and average latency.

``--local`` runs fully hermetic: it boots the aiohttp serving shell
in-process (mock LLM, synthetic corpus, dynamic batcher on) and load
tests that — the mode used on TPU hosts with no deployed stack.

Usage: python load_testing.py [--local] [--backend URL] [--concurrency 10]
"""

from __future__ import annotations

import argparse
import asyncio
import time

import httpx

from financial_rag_system_tpu.utils.config import default_backend_url

TICKER = "AAPL"

_SECTIONS: dict[str, list[str]] = {
    "Revenue": [
        "What was total revenue for the year?",
        "How did product revenue compare to services revenue?",
        "What was iPhone revenue in the latest quarter?",
        "Which segment grew revenue the fastest?",
        "What portion of revenue came from subscriptions?",
        "How did revenue trend across the last three quarters?",
        "What was the total net sales figure?",
        "Did wearables revenue increase or decrease?",
        "How much revenue came from the americas segment?",
        "What drove the change in services revenue?",
    ],
    "Margins": [
        "What was the gross margin percentage?",
        "How did services margin compare to product margin?",
        "What factors affected gross margin this year?",
        "Did operating margin expand or contract?",
        "What was the operating income for the period?",
        "How do component costs impact margins?",
        "What is management's margin outlook?",
        "How did mix shift affect overall margin?",
        "What was net income as a share of revenue?",
        "Which costs grew faster than revenue?",
    ],
    "Risk": [
        "What are the primary supply chain risk factors?",
        "Which geographic risks does the company highlight?",
        "What regulatory risks are disclosed?",
        "How concentrated is the manufacturing base?",
        "What litigation risks are described?",
        "What cybersecurity risks are identified?",
        "How could currency movements impact results?",
        "What competitive risks does management cite?",
        "Are there risks around key personnel?",
        "What risks relate to new product introductions?",
    ],
    "R&D": [
        "How much was spent on research and development?",
        "Did R&D expense grow year over year?",
        "What areas receive the most R&D investment?",
        "How does R&D intensity compare to revenue growth?",
        "What new technologies are under development?",
        "How many patents were referenced?",
        "Is R&D spending expected to increase?",
        "What share of operating expense is R&D?",
        "How is R&D allocated between hardware and software?",
        "What innovation initiatives are described?",
    ],
    "AI": [
        "What is the strategy for artificial intelligence?",
        "How is machine learning used in products?",
        "What role does the neural engine play?",
        "Are generative AI features discussed?",
        "How does AI affect capital expenditure plans?",
        "What AI-related risks are mentioned?",
        "How is user privacy preserved in AI features?",
        "Which products integrate on-device intelligence?",
        "Is AI expected to drive services growth?",
        "What compute infrastructure supports AI workloads?",
    ],
    "Capital": [
        "How much stock was repurchased?",
        "What dividends were declared?",
        "What is the outstanding share count?",
        "How much cash does the company hold?",
        "What is the debt maturity profile?",
        "How is capital allocated between buybacks and dividends?",
        "What were capital expenditures for the year?",
        "Did the board authorize a new repurchase program?",
        "What is the net cash position?",
        "How did financing activities change cash?",
    ],
    "Supply": [
        "Who manufactures the company's hardware?",
        "Where are the key manufacturing partners located?",
        "How would a component shortage affect output?",
        "What inventory levels are reported?",
        "How are supplier relationships managed?",
        "What logistics disruptions occurred?",
        "Is manufacturing concentrated in asia?",
        "What single-source components exist?",
        "How does the company mitigate supply disruption?",
        "What purchase commitments are outstanding?",
    ],
    "Segments": [
        "How did the americas segment perform?",
        "What was greater china revenue?",
        "Which operating segment is most profitable?",
        "How is segment performance measured?",
        "What was europe segment growth?",
        "How did japan revenue trend?",
        "What drives rest of asia pacific results?",
        "Are segment margins disclosed?",
        "Which segment declined this period?",
        "How does currency affect segment comparisons?",
    ],
    "Taxes": [
        "What was the effective tax rate?",
        "How did tax reform affect the provision?",
        "What deferred tax assets are recorded?",
        "Are there unresolved tax examinations?",
        "What foreign earnings are indefinitely reinvested?",
        "How did the tax provision change year over year?",
        "What tax contingencies are disclosed?",
        "Which jurisdictions drive the tax rate?",
        "What was cash paid for income taxes?",
        "How do tax credits affect the rate?",
    ],
    "Outlook": [
        "What guidance did management provide?",
        "What seasonality affects the business?",
        "What trends does management expect next quarter?",
        "Are there known headwinds discussed?",
        "What growth drivers are identified?",
        "How does management view demand trends?",
        "What macroeconomic factors are cited?",
        "Is pricing expected to change?",
        "What commitments could affect future results?",
        "How sustainable is services growth?",
    ],
}

QUERIES: list[str] = [q for qs in _SECTIONS.values() for q in qs]
assert len(QUERIES) == 100


async def clear_cache(client: httpx.AsyncClient, backend: str) -> None:
    r = await client.delete(f"{backend}/cache/clear/{TICKER}")
    print(f"cache cleared: {r.json().get('cleared_entries', 0)} entries")


async def fetch_answer(
    client: httpx.AsyncClient,
    backend: str,
    sem: asyncio.Semaphore,
    i: int,
    query: str,
) -> float:
    async with sem:
        t0 = time.time()
        try:
            r = await client.post(
                f"{backend}/ask",
                json={"query": query, "ticker": TICKER},
                timeout=90.0,
            )
            body = r.json()
            dt = time.time() - t0
            tag = "CACHE HIT" if body.get("cached") else "LIVE"
            print(
                f"[{i:3d}] {tag:9s} {dt*1000:8.1f} ms  "
                f"{body.get('provider','?'):24s} {query[:48]}"
            )
            return dt
        except Exception as exc:
            dt = time.time() - t0
            print(f"[{i:3d}] FAIL      {dt*1000:8.1f} ms  {exc}")
            return dt


async def run_load_test(backend: str, concurrency: int = 10) -> dict:
    sem = asyncio.Semaphore(concurrency)
    async with httpx.AsyncClient() as client:
        await clear_cache(client, backend)
        t0 = time.time()
        latencies = await asyncio.gather(
            *[
                fetch_answer(client, backend, sem, i, q)
                for i, q in enumerate(QUERIES)
            ]
        )
        total = time.time() - t0
    avg = sum(latencies) / len(latencies)
    print("=" * 60)
    print(
        f"total: {total:.2f}s for {len(QUERIES)} queries | "
        f"avg latency: {avg*1000:.1f} ms | "
        f"throughput: {len(QUERIES)/total:.1f} q/s"
    )
    print("=" * 60)
    return {"total_s": total, "avg_latency_ms": avg * 1000}


async def run_local() -> dict:
    """Boot the full serving shell in-process and load test it."""
    from aiohttp import web

    from financial_rag_system_tpu.data.synthetic import make_corpus
    from financial_rag_system_tpu.index.flat import FlatIndex
    from financial_rag_system_tpu.models.embedder import get_embedder
    from financial_rag_system_tpu.models.reranker import get_reranker
    from financial_rag_system_tpu.serving.app import create_app
    from financial_rag_system_tpu.serving.engine import RAGEngine
    from financial_rag_system_tpu.utils.config import Config

    cfg = Config(testing=True, database_url=":memory:")
    embedder = get_embedder()
    import os

    on_tpu = os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)
    index = FlatIndex(cfg.embed_dim, capacity=8192, tile=1024 if on_tpu else 128,
                      use_pallas=on_tpu)
    ids, texts, payloads = make_corpus(4096)
    bs = 512
    for s in range(0, len(ids), bs):
        sl = slice(s, s + bs)
        index.upsert(ids[sl], embedder.encode(texts[sl]), texts[sl], payloads[sl])
    engine = RAGEngine(cfg, index, embedder, get_reranker(), mode="batched")

    app = create_app(engine)
    runner = web.AppRunner(app)
    await runner.setup()
    site = web.TCPSite(runner, "127.0.0.1", 0)
    await site.start()
    port = site._server.sockets[0].getsockname()[1]
    print(f"local backend on :{port} with {index.n_valid} chunks")
    try:
        return await run_load_test(f"http://127.0.0.1:{port}")
    finally:
        await runner.cleanup()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--local", action="store_true")
    ap.add_argument("--backend", default=None,
                help="backend URL (default: BACKEND_URL env or DNS probe)")
    ap.add_argument("--concurrency", type=int, default=10)
    args = ap.parse_args()
    if args.local:
        asyncio.run(run_local())
    else:
        asyncio.run(
            run_load_test(
                args.backend or default_backend_url(), args.concurrency
            )
        )
