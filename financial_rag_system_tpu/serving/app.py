"""HTTP serving shell (aiohttp) — the reference's FastAPI surface.

Endpoints and semantics match reference main.py:126-328 / main2.py:318-342:

- ``POST /ask``       {query, ticker, document_type?, top_k=5} -> answer doc
- ``POST /embed``     {texts: [...]} -> {embeddings: [[...]]} (ingestion reuse)
- ``POST /feedback``  {query_hash, rating} -> {status: ok}
- ``DELETE /cache/clear/{ticker}`` -> {cleared_entries: N}
- ``GET /health`` ``/ready`` ``/queue_status``
- extras: ``GET /metrics`` (stage-latency aggregates), ``GET /traces``

Validation uses pydantic and returns 422 on schema errors, matching
FastAPI's contract (the reference test suite asserts 422 on a missing
ticker, tests.py:76-80).  /ask is wrapped in the reference's 90 s
request timeout (main2.py:330-331).
"""

from __future__ import annotations

import asyncio
import json
from typing import Optional

from aiohttp import web
from pydantic import BaseModel, ValidationError

from financial_rag_system_tpu.obs.tracing import get_tracer
from financial_rag_system_tpu.serving.engine import RAGEngine


class QueryRequest(BaseModel):
    query: str
    ticker: str
    document_type: Optional[str] = None
    top_k: int = 5


class EmbedRequest(BaseModel):
    texts: list[str]


class FeedbackRequest(BaseModel):
    query_hash: str
    rating: int


class UpsertRequest(BaseModel):
    ids: list[str]
    texts: list[str]
    payloads: list[dict]


def _validation_error(exc: ValidationError) -> web.Response:
    return web.json_response({"detail": json.loads(exc.json())}, status=422)


def create_app(engine: RAGEngine) -> web.Application:
    app = web.Application()

    async def on_startup(app: web.Application) -> None:
        await engine.startup()
        # continuous observability export (MLflow tracking server and/or
        # OTLP collector), decoupled from the request path — started
        # only when the environment wires a sink (obs/export_loop.py);
        # the reference exported per-request via MLflow/OTel
        # instrumentation (main2.py:306-313, main.py:74-75)
        from financial_rag_system_tpu.obs.export_loop import (
            maybe_start_export_loop,
        )

        app["trace_export_loop"] = maybe_start_export_loop(get_tracer())

    async def on_cleanup(app: web.Application) -> None:
        loop = app.get("trace_export_loop")
        if loop is not None:
            await asyncio.to_thread(loop.stop)
        await engine.shutdown()

    app.on_startup.append(on_startup)
    app.on_cleanup.append(on_cleanup)

    async def ask(request: web.Request) -> web.Response:
        try:
            req = QueryRequest.model_validate(await request.json())
        except ValidationError as exc:
            return _validation_error(exc)
        try:
            result = await asyncio.wait_for(
                engine.ask(
                    req.query, req.ticker, req.top_k, req.document_type
                ),
                timeout=engine.cfg.request_timeout_s,
            )
        except asyncio.TimeoutError:
            return web.json_response({"detail": "request timed out"}, status=504)
        return web.json_response(result)

    async def embed(request: web.Request) -> web.Response:
        try:
            req = EmbedRequest.model_validate(await request.json())
        except ValidationError as exc:
            return _validation_error(exc)
        return web.json_response({"embeddings": await engine.embed(req.texts)})

    async def feedback(request: web.Request) -> web.Response:
        try:
            req = FeedbackRequest.model_validate(await request.json())
        except ValidationError as exc:
            return _validation_error(exc)
        await asyncio.to_thread(engine.feedback, req.query_hash, req.rating)
        return web.json_response({"status": "ok"})

    async def clear_cache(request: web.Request) -> web.Response:
        ticker = request.match_info["ticker"]
        count = await asyncio.to_thread(engine.clear_cache, ticker)
        return web.json_response({"cleared_entries": count})

    async def index_upsert(request: web.Request) -> web.Response:
        try:
            req = UpsertRequest.model_validate(await request.json())
        except ValidationError as exc:
            return _validation_error(exc)
        if not (len(req.ids) == len(req.texts) == len(req.payloads)):
            return web.json_response(
                {"detail": "ids/texts/payloads length mismatch"}, status=422
            )
        new_rows = await engine.ingest_chunks(req.ids, req.texts, req.payloads)
        return web.json_response(
            {"new_rows": new_rows, "indexed_chunks": engine.index.n_valid}
        )

    async def index_save(request: web.Request) -> web.Response:
        directory = engine.cfg.index_dir
        idx = engine.index
        # HNSW persists graph+flat; IVF persists via its wrapped flat
        target = idx if hasattr(idx, "save") else idx.flat
        await asyncio.to_thread(target.save, directory)
        # index files from a previous save must not outlive a save under
        # a different tier OR family — on restart they would be paired
        # with state they don't describe (a stale sharded_index.npz would
        # shadow a newer flat corpus, and vice versa)
        import os

        from financial_rag_system_tpu.index.hnsw import HNSWIndex
        from financial_rag_system_tpu.index.ivf import IVFIndex
        from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
        from financial_rag_system_tpu.index.sharded_hnsw import (
            ShardedHNSWIndex,
        )

        # multi-process serving wraps the tier in a BroadcastIndex; tier
        # identity lives on .inner (else the sweep would delete the graph
        # file the save just wrote)
        tier_obj = getattr(idx, "inner", idx)
        sharded = isinstance(getattr(idx, "flat", idx), ShardedFlatIndex)
        stale_files = (
            ["sharded_index.npz", ShardedHNSWIndex.GRAPH_FILE]
            if not sharded
            else ["flat_index.npz", HNSWIndex.GRAPH_FILE, IVFIndex.IVF_FILE]
        )
        if not sharded:
            for klass, fname in (
                (HNSWIndex, HNSWIndex.GRAPH_FILE),
                (IVFIndex, IVFIndex.IVF_FILE),
            ):
                if not isinstance(tier_obj, klass):
                    stale_files.append(fname)
        elif not isinstance(tier_obj, ShardedHNSWIndex):
            stale_files.append(ShardedHNSWIndex.GRAPH_FILE)
        for fname in stale_files:
            stale = os.path.join(directory, fname)
            if os.path.exists(stale):
                os.unlink(stale)
        return web.json_response({"saved_to": directory})

    async def index_rebuild(request: web.Request) -> web.Response:
        tier = None
        if request.can_read_body and await request.read():
            try:
                body = await request.json()
                tier = body.get("tier")
            except (json.JSONDecodeError, AttributeError):
                return web.json_response(
                    {"detail": "body must be a JSON object"}, status=400
                )
        if tier is not None and tier not in ("ivf", "hnsw"):
            return web.json_response(
                {"detail": f"unknown tier {tier!r}; expected ivf|hnsw"},
                status=400,
            )
        return web.json_response(
            await asyncio.to_thread(engine.rebuild_index, tier)
        )

    async def health(request: web.Request) -> web.Response:
        return web.json_response({"status": "ok"})

    async def ready(request: web.Request) -> web.Response:
        return web.json_response(engine.ready())

    async def queue_status(request: web.Request) -> web.Response:
        return web.json_response(engine.queue_status())

    async def metrics(request: web.Request) -> web.Response:
        return web.json_response(get_tracer().metrics_snapshot())

    async def traces(request: web.Request) -> web.Response:
        n = int(request.query.get("n", 20))
        return web.json_response(get_tracer().recent_traces(n))

    async def traces_mlflow(request: web.Request) -> web.Response:
        """MLflow-schema trace export (obs/mlflow_export.py) — the
        interop surface for the reference's MLflow tooling."""
        from financial_rag_system_tpu.obs.mlflow_export import to_mlflow_traces

        n = int(request.query.get("n", 100))
        return web.json_response(
            to_mlflow_traces(get_tracer().recent_traces(n))
        )

    async def traces_otlp(request: web.Request) -> web.Response:
        """OTLP-JSON trace export (obs/otlp_export.py) — the payload the
        continuous pump POSTs to a collector, served for inspection and
        for pull-based scraping."""
        from financial_rag_system_tpu.obs.otlp_export import to_otlp

        n = int(request.query.get("n", 100))
        return web.json_response(to_otlp(get_tracer().recent_traces(n)))

    async def ui(request: web.Request) -> web.Response:
        from financial_rag_system_tpu.serving.ui import PAGE

        return web.Response(text=PAGE, content_type="text/html")

    app.add_routes(
        [
            web.post("/ask", ask),
            web.post("/embed", embed),
            web.post("/feedback", feedback),
            web.delete("/cache/clear/{ticker}", clear_cache),
            web.post("/index/upsert", index_upsert),
            web.post("/index/save", index_save),
            web.post("/index/rebuild", index_rebuild),
            web.get("/health", health),
            web.get("/ready", ready),
            web.get("/queue_status", queue_status),
            web.get("/metrics", metrics),
            web.get("/traces", traces),
            web.get("/traces/mlflow", traces_mlflow),
            web.get("/traces/otlp", traces_otlp),
            web.get("/", ui),
        ]
    )
    return app


def build_default_engine(mode: str = "batched") -> RAGEngine:
    """Wire an engine from env config: persisted index if present, else empty."""
    import os

    from financial_rag_system_tpu.index.flat import FlatIndex
    from financial_rag_system_tpu.models.embedder import get_embedder
    from financial_rag_system_tpu.models.reranker import get_reranker
    from financial_rag_system_tpu.utils.config import (
        enable_compilation_cache,
        get_config,
    )

    enable_compilation_cache()  # cold server start reuses prior compiles
    cfg = get_config()
    embedder = get_embedder(cfg.embed_dim)
    reranker = get_reranker(testing=cfg.testing)

    # keep a device token store so the fused single-program pipeline can
    # rerank without host round trips (applies to the single-chip AND
    # the mesh-sharded engines).  Both model stacks use it: the full
    # stack's cross-encoder gathers candidate token ids from HBM, and
    # the hermetic hash stack's DE-ALIASED hash rerank does the same
    # (ops/fused_query.fused_hash_rerank_query).
    tok = getattr(embedder, "tokenizer", None)
    # 0 = auto: the store materializes at the measured p99 wordpiece
    # width on first ingest (index/flat.py auto_token_width)
    dlen = (
        (cfg.token_store_len or "auto") if tok is not None else None
    )

    import jax

    if len(jax.devices()) > 1:
        # multi-device serving: shard the corpus over the mesh.  With the
        # full model stack each shard searches its rows and the merged
        # top-k reranks work-balanced across shards
        # (make_sharded_fused_query) — 1 sync/batch; otherwise
        # the staged shard_map pipeline serves.  Multi-PROCESS serving
        # builds the SAME global-mesh index on every process; main()
        # wraps the coordinator's in a BroadcastIndex and runs workers
        # through the op-broadcast loop (parallel/control.py), so every
        # device_put/search executes on all processes in the same order
        # and the corpus is built exactly once.
        from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
        from financial_rag_system_tpu.parallel.mesh import create_mesh

        import jax.numpy as jnp

        mesh = create_mesh(cfg.mesh_shape)
        if os.path.exists(os.path.join(cfg.index_dir, "sharded_index.npz")):
            index = ShardedFlatIndex.load(
                cfg.index_dir, mesh, use_pallas=cfg.use_pallas, tokenizer=tok
            )
            from financial_rag_system_tpu.index.sharded_hnsw import (
                ShardedHNSWIndex,
            )

            gf = os.path.join(cfg.index_dir, ShardedHNSWIndex.GRAPH_FILE)
            if os.path.exists(gf):
                try:
                    index = ShardedHNSWIndex.load(cfg.index_dir, index)
                except ValueError as exc:  # stale/mismatched: serve flat
                    print(f"ignoring persisted ShardedHNSWIndex: {exc}")
        else:
            if os.path.exists(os.path.join(cfg.index_dir, "flat_index.npz")):
                print(
                    "warning: a single-device flat_index.npz exists but "
                    "multi-device serving starts a fresh sharded index — "
                    "re-ingest or save under this topology"
                )
            index = ShardedFlatIndex(
                mesh, cfg.embed_dim, capacity=cfg.max_corpus,
                tile=cfg.corpus_tile,
                use_pallas=cfg.use_pallas,
                dtype=jnp.dtype(cfg.index_dtype),
                token_store_len=dlen, tokenizer=tok,
                token_store_max=cfg.token_store_max,
            )
        return RAGEngine(cfg, index, embedder, reranker, mode=mode)
    if os.path.exists(os.path.join(cfg.index_dir, "flat_index.npz")):
        index = FlatIndex.load(
            cfg.index_dir, use_pallas=cfg.use_pallas, tokenizer=tok
        )
        from financial_rag_system_tpu.index.hnsw import HNSWIndex
        from financial_rag_system_tpu.index.ivf import IVFIndex

        # at most one tier file survives a save; restore whichever exists
        for klass, fname in (
            (HNSWIndex, HNSWIndex.GRAPH_FILE),
            (IVFIndex, IVFIndex.IVF_FILE),
        ):
            if os.path.exists(os.path.join(cfg.index_dir, fname)):
                try:
                    index = klass.load(cfg.index_dir, index)
                except ValueError as exc:  # stale file: serve flat instead
                    print(f"ignoring persisted {klass.__name__}: {exc}")
                break
    else:
        import jax.numpy as jnp

        index = FlatIndex(
            cfg.embed_dim, tile=cfg.corpus_tile, use_pallas=cfg.use_pallas,
            token_store_len=dlen, tokenizer=tok,
            dtype=jnp.dtype(cfg.index_dtype),
            token_store_max=cfg.token_store_max,
        )
    return RAGEngine(cfg, index, embedder, reranker, mode=mode)


def main() -> None:  # pragma: no cover — exercised by tests/test_multihost.py
    import os

    from financial_rag_system_tpu.parallel.distributed import (
        initialize_distributed,
        is_coordinator,
    )
    from financial_rag_system_tpu.utils.config import get_config

    multi = initialize_distributed()
    cfg = get_config()
    engine = build_default_engine()
    if multi:
        import jax

        from financial_rag_system_tpu.parallel.control import (
            BroadcastIndex,
            ControlServer,
            worker_loop,
        )

        coord_host = os.environ.get(
            "JAX_COORDINATOR_ADDRESS", "localhost:0"
        ).rsplit(":", 1)[0]
        if is_coordinator():
            # the control channel carries pickled ops: bind it to the
            # pod-internal interface (FRS_CONTROL_HOST), not the public
            # HTTP host; FRS_CONTROL_TOKEN adds the HMAC handshake
            # (parallel/control.py trust model)
            control_host = os.environ.get("FRS_CONTROL_HOST", cfg.host)
            server = ControlServer(
                control_host, cfg.control_port, jax.process_count() - 1
            )
            engine.index = BroadcastIndex(server, engine.index)
            # re-evaluate fusion now that the index is wrapped: the fused
            # program targets the INNER index and batches become one
            # broadcast op each (engine._fused_batch)
            engine._fused_fn = engine._maybe_build_fused()
            # collective warmup: establish the global-mesh Gloo/ICI
            # contexts NOW, while every process is rendezvoused at the
            # control-channel connect (ControlServer.__init__ blocks for
            # all workers).  Context init carries a fixed ~30 s deadline;
            # deferring the first collective to the first /ask makes it
            # race the fused program's cross-process COMPILE skew, which
            # under load exceeds the deadline (observed as suite flakes).
            # A k=1 search is tiny to compile and exercises the exact
            # all-gather communicator serving uses.
            import numpy as np

            engine.index.search_device(
                np.zeros((1, cfg.embed_dim), np.float32),
                np.full((1, 2), -1, np.int32),
                1,
            )
            try:
                web.run_app(create_app(engine), host=cfg.host, port=cfg.port)
            finally:
                server.shutdown()  # releases parked workers
            return
        else:
            # workers execute the coordinator's op stream so global-mesh
            # device programs (upsert scatter, sharded search, fused
            # batches, rebuild) run on every process; no HTTP port is
            # bound here.  The engine travels too: the "fused" op needs
            # its model params + jitted pipeline.
            print("worker process: serving handled by the coordinator")
            worker_loop(
                engine.index, coord_host, cfg.control_port, engine=engine
            )
            return
    web.run_app(create_app(engine), host=cfg.host, port=cfg.port)


if __name__ == "__main__":  # pragma: no cover
    main()
