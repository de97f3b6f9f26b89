"""Hard-mode evaluator: corpus invariants + de-saturation.

The easy golden set saturates (Hit@5 100 / MRR 1.0), so regressions are
invisible there; --hard is the harness with headroom (VERDICT r1 weak #5).
"""

import numpy as np

from financial_rag_system_tpu.data.synthetic import (
    HARD_INTENTS,
    make_hard_corpus,
    make_hard_set,
)


def test_hard_set_shape():
    qs = make_hard_set()
    assert len(qs) >= 50
    # paraphrase invariant: a query never contains its scoring keywords
    for q in qs:
        low = q["query"].lower()
        assert not any(k.lower() in low for k in q["expected_keywords"]), q


def test_hard_corpus_keyword_uniqueness():
    """Scoring keywords appear ONLY in their intent's positives — baits and
    filler sharing them would corrupt the substring scoring."""
    ids, texts, payloads = make_hard_corpus(4096)
    assert len(ids) == len(set(ids)) == 4096
    for intent in HARD_INTENTS:
        kws = [k.lower() for k in intent["keywords"]]
        for text, p in zip(texts, payloads):
            if any(k in text.lower() for k in kws):
                assert p["source_file"] == f"hard_{intent['name']}", (
                    intent["name"], p["source_file"], text[:80],
                )


def test_hard_corpus_cross_ticker_positives():
    """Every ticker carries a positive with the same keywords, so the
    metadata filter is load-bearing for the hard metrics."""
    _, texts, payloads = make_hard_corpus(2048)
    intent = HARD_INTENTS[0]
    tickers = {
        p["ticker"]
        for text, p in zip(texts, payloads)
        if intent["keywords"][0].lower() in text.lower()
    }
    assert len(tickers) == 8


def test_hard_mode_desaturated(tmp_path, monkeypatch):
    """End-to-end hard evaluation on a small corpus: the metric must have
    headroom (MRR strictly < 1) while still registering hits."""
    import evaluate

    res = evaluate.run_evaluation(k=5, n_chunks=4096, hard=True)
    assert res["mrr"] < 1.0  # de-saturated: regressions can move it
    assert res["hit_rate"] > 0.0  # ...but the harness still has signal
    # the easy set stays at ceiling — that's the parity gate, not this one
    easy = evaluate.run_evaluation(k=5, n_chunks=2048, hard=False)
    assert easy["hit_rate"] == 100.0 and easy["mrr"] == 1.0
