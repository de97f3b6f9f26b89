"""Deterministic synthetic SEC-filing corpus for hermetic harnesses.

This environment has no EDGAR egress, so the evaluator, load test and
benchmark build their corpora here: topic paragraphs that read like
10-K/10-Q prose (each golden-set topic's keywords appear in its
paragraph, so the keyword-substring scoring of the reference's
evaluator, evaluate.py:96-101, measures real retrieval), plus
parameterically many distractor chunks across several tickers for
scale.  Everything is seeded and reproducible.
"""

from __future__ import annotations

import random
from typing import Any

from financial_rag_system_tpu.utils.hashing import point_id

# Topic paragraphs for AAPL covering the golden-set intents.
AAPL_TOPICS: dict[str, str] = {
    "supply_chain": (
        "The Company's supply chain remains subject to significant risk. "
        "Substantially all of the Company's hardware components are "
        "manufactured by outsourcing partners, primarily located in china "
        "and other parts of Asia. A disruption at any of these manufacturing "
        "partners, shortages of critical components, or logistics failures "
        "could materially and adversely affect product availability."
    ),
    "iphone_sales": (
        "iPhone net sales were 200.6 billion dollars in the fiscal year, "
        "a decrease of 2 percent compared to the prior year. The decline in "
        "iphone revenue was driven primarily by lower net sales of Pro "
        "models, partially offset by the launch of new models in the first "
        "quarter."
    ),
    "rnd_spend": (
        "Research and development expense was 29.9 billion dollars, an "
        "increase of 14 percent year over year. The growth in R&D expense "
        "reflects continued investment in innovation, headcount, and "
        "infrastructure supporting new products and services."
    ),
    "ai_strategy": (
        "The Company continues to invest in machine learning and "
        "artificial intelligence across its products. The neural engine in "
        "Company silicon accelerates on-device ai workloads, and generative "
        "intelligence features are integrated across the operating systems "
        "while preserving user privacy."
    ),
    "services_growth": (
        "Services revenue increased 9 percent to a record, driven by growth "
        "in advertising, the app store, and cloud services including icloud "
        "storage subscription plans. Paid subscription growth continued "
        "across the services portfolio, exceeding one billion paid "
        "subscriptions in the services sector."
    ),
}

_FILLER_SUBJECTS = [
    "deferred revenue recognition", "operating lease commitments",
    "share repurchase program", "effective tax rate reconciliation",
    "foreign currency hedging", "segment operating performance",
    "goodwill impairment testing", "stock based compensation",
    "capital expenditure plans", "dividend declarations",
    "interest rate sensitivity", "legal proceedings and contingencies",
    "inventory valuation methods", "warranty accrual estimates",
    "customer concentration metrics", "seasonality of demand",
]

_TICKERS = ["AAPL", "MSFT", "GOOG", "AMZN", "NVDA", "META", "TSLA", "JPM"]


_NOTE_TEMPLATES = [
    "Note {i}: {t} provides disclosure concerning {subj}. The balance "
    "changed {pct} percent to {amt} billion dollars during the period, "
    "consistent with management expectations.",
    "Item {i}. {t} management discussion of {subj}: amounts moved {pct} "
    "percent versus the comparable period, reaching {amt} billion dollars.",
    "Footnote {i} ({t}): {subj} is measured at fair value; the recorded "
    "amount of {amt} billion dollars reflects a {pct} percent change.",
    "Note {i} to the {t} financial statements covers {subj}, which "
    "totaled {amt} billion dollars, a {pct} percent movement year over year.",
]


def _distractor(rng: random.Random, ticker: str, i: int) -> str:
    subj = rng.choice(_FILLER_SUBJECTS)
    tmpl = rng.choice(_NOTE_TEMPLATES)
    return tmpl.format(
        i=i, t=ticker, subj=subj, pct=rng.randint(1, 40),
        amt=rng.randint(1, 900) / 10,
    )


def make_corpus(
    n_chunks: int = 1000, *, seed: int = 0, tickers: list[str] | None = None
) -> tuple[list[str], list[str], list[dict[str, Any]]]:
    """Returns (ids, texts, payloads) with the AAPL topic chunks first."""
    rng = random.Random(seed)
    tickers = tickers or _TICKERS
    ids, texts, payloads = [], [], []

    for name, para in AAPL_TOPICS.items():
        ids.append(point_id("AAPL", "10-K", f"topic_{name}", 0))
        texts.append(para)
        payloads.append(
            {"ticker": "AAPL", "document_type": "10-K", "source_file": f"topic_{name}"}
        )

    i = 0
    while len(ids) < n_chunks:
        ticker = tickers[i % len(tickers)]
        ftype = "10-K" if i % 3 else "10-Q"
        ids.append(point_id(ticker, ftype, "distractors", i))
        texts.append(_distractor(rng, ticker, i))
        payloads.append(
            {"ticker": ticker, "document_type": ftype, "source_file": "distractors"}
        )
        i += 1
    return ids, texts, payloads


# Golden evaluation set: intentionally IDENTICAL to the reference's
# EVAL_DATASET (evaluate.py:28-54) — queries and keyword lists verbatim.
# BASELINE.md's Hit@5/MRR parity target is defined on this exact query
# set, so keeping it unchanged is benchmark fidelity, not reuse for
# convenience.  (A harder, first-party set lives in evaluate.py --hard.)
GOLDEN_SET = [
    {
        "query": "What are Apple's primary risk factors regarding the supply chain?",
        "ticker": "AAPL",
        "expected_keywords": [
            "supply chain", "components", "manufacturing", "china", "disruption",
        ],
    },
    {
        "query": "What was the total net sales for iPhone in the recent fiscal year?",
        "ticker": "AAPL",
        "expected_keywords": ["iphone", "net sales", "billion", "revenue"],
    },
    {
        "query": "How much did Apple spend on Research and Development (R&D)?",
        "ticker": "AAPL",
        "expected_keywords": [
            "research and development", "r&d", "innovation", "expense",
        ],
    },
    {
        "query": "What is Apple's strategy for Artificial Intelligence and Machine Learning?",
        "ticker": "AAPL",
        "expected_keywords": [
            "neural engine", "machine learning", "ai", "intelligence", "generative",
        ],
    },
    {
        "query": "Discuss Apple's service sector revenue growth.",
        "ticker": "AAPL",
        "expected_keywords": [
            "services", "subscription", "app store", "icloud", "growth",
        ],
    },
]
