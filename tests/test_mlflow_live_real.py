"""Live-export against a GENUINE MLflow tracking server (VERDICT r4 #6).

The fake-module test (test_mlflow_export.py) proves the replay shape;
schema/API drift only shows against a real server — the same treatment
the Postgres cache got in r4 (tests/test_cache_pg_real.py).  Reference:
the mlflow compose service + span decorators (reference
docker-compose.yml:36-63, main2.py:306-313).

Opt-in: requires the ``mlflow`` package (not part of this image) AND
``FRS_MLFLOW_URI`` pointing at a reachable tracking server, e.g.

    pip install mlflow
    mlflow server --host 127.0.0.1 --port 5600 \
        --backend-store-uri sqlite:///mlflow-ci.db &
    FRS_MLFLOW_URI=http://127.0.0.1:5600 \
        python -m pytest tests/test_mlflow_live_real.py -q

CI runs exactly that (.github/workflows/deploy.yml "MLflow live-export"
step); locally ``docker compose --profile mlflow up`` provides one at
http://localhost:5000.  Skipped (not failed) otherwise.
"""

import os
import uuid

import pytest

MLFLOW_URI = os.environ.get("FRS_MLFLOW_URI", "")


def _mlflow_available() -> bool:
    try:
        import mlflow  # noqa: F401

        return True
    except ImportError:
        return False


pytestmark = pytest.mark.skipif(
    not MLFLOW_URI or not _mlflow_available(),
    reason="FRS_MLFLOW_URI not set or mlflow not installed",
)


def test_try_live_export_replays_span_tree(monkeypatch):
    from financial_rag_system_tpu.obs.mlflow_export import try_live_export
    from financial_rag_system_tpu.obs.tracing import Tracer

    import mlflow
    from mlflow.tracking import MlflowClient

    experiment = f"frs-live-export-{uuid.uuid4().hex[:8]}"
    monkeypatch.setenv("MLFLOW_TRACKING_URI", MLFLOW_URI)
    monkeypatch.setenv("MLFLOW_EXPERIMENT", experiment)

    t = Tracer()
    with t.span(
        "RAG_Workflow", kind="CHAIN", inputs={"user_query": "revenue growth"}
    ) as root:
        with t.span("1_Query_Routing", kind="TOOL"):
            pass
        with t.span("4_Context_Retrieval", kind="RETRIEVER"):
            pass
        with t.span("LLM_Generation", kind="LLM") as sp:
            sp.outputs = "the answer"
        root.outputs = "the answer"

    assert try_live_export(t) is True

    # the server must now hold one trace in our experiment whose spans
    # carry the reference taxonomy with the recorded hierarchy
    client = MlflowClient(MLFLOW_URI)
    exp = client.get_experiment_by_name(experiment)
    assert exp is not None, "experiment was not created on the server"
    traces = client.search_traces(experiment_ids=[exp.experiment_id])
    assert traces, "no trace arrived on the server"
    tr = traces[0]
    spans = tr.data.spans
    by_name = {s.name: s for s in spans}
    assert {"RAG_Workflow", "1_Query_Routing", "LLM_Generation"} <= set(by_name)
    root_sp = by_name["RAG_Workflow"]
    llm = by_name["LLM_Generation"]
    assert llm.parent_id == root_sp.span_id, "hierarchy flattened on replay"
    # span types survive the round-trip (mlflow.spanType attribute)
    assert "LLM" in str(llm.span_type)
    assert "CHAIN" in str(root_sp.span_type)


def test_live_export_never_breaks_serving(monkeypatch):
    """A dead tracking URI must degrade to False, not raise — serving
    cannot depend on the observability sidecar (reference
    main2.py:310-313 wraps its MLflow calls the same way)."""
    from financial_rag_system_tpu.obs.mlflow_export import try_live_export
    from financial_rag_system_tpu.obs.tracing import Tracer

    monkeypatch.setenv("MLFLOW_TRACKING_URI", "http://127.0.0.1:9")  # refuses
    # mlflow's REST client retries with exponential backoff (minutes at
    # the default 7 attempts); one try is enough to prove degradation
    monkeypatch.setenv("MLFLOW_HTTP_REQUEST_MAX_RETRIES", "1")
    monkeypatch.setenv("MLFLOW_HTTP_REQUEST_TIMEOUT", "5")
    t = Tracer()
    with t.span("RAG_Workflow", kind="CHAIN"):
        pass
    assert try_live_export(t) is False
