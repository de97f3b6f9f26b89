"""Localize hard-mode eval misses to a pipeline stage.

For every hard-set query this prints the rank of the first
keyword-bearing chunk (the scoring criterion of evaluate.py:292-299,
itself the reference's harness, /root/reference/evaluate.py:96-111) at
three points:

  exact   — rank in the full filtered exact ordering (flat tier, large k)
  fan-15  — whether it survives the retrieve-15 stage the two-stage
            pipeline feeds the reranker (reference main.py behavior)
  rerank  — rank after the cross-encoder reorders the 15

A miss with exact-rank > 15 is a BI-ENCODER failure (reranker never saw
the target); exact-rank <= 15 but rerank-rank > 5 is a CROSS-ENCODER
failure.  This distinction decides where the next supervision or
architecture effort goes.

Usage (serve the checkpoints under test via the env contract):
  RAG_TPU_BGE_DIR=... RAG_TPU_RERANKER_DIR=... \
      python scripts/diag_hard_misses.py [--corpus 65536] [--fan 15]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=65536)
    ap.add_argument("--fan", type=int, default=15)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--exact-k", type=int, default=50)
    ap.add_argument("--misses-only", action="store_true")
    args = ap.parse_args()

    from financial_rag_system_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()

    from evaluate import build_index
    from financial_rag_system_tpu.data.synthetic import make_hard_set
    from financial_rag_system_tpu.models.embedder import get_embedder
    from financial_rag_system_tpu.models.reranker import get_reranker

    embedder = get_embedder()
    reranker = get_reranker()
    use_pallas = os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)
    index = build_index(args.corpus, embedder, use_pallas, hard=True)
    print(f"corpus: {index.n_valid} chunks (hard mode)")

    golden = make_hard_set()
    stage_counts = {"hit": 0, "bi": 0, "ce": 0}
    rows = []
    for item in golden:
        vec = embedder.encode([item["query"]])
        kws = [kw.lower() for kw in item["expected_keywords"]]

        def kw_rank(cands: list[dict]) -> int:
            for rank, hit in enumerate(cands, start=1):
                if any(kw in hit["text"].lower() for kw in kws):
                    return rank
            return 0

        exact = index.search(vec, ticker=item["ticker"], k=args.exact_k)[0]
        exact_rank = kw_rank(exact)
        fan = exact[: args.fan]
        scores = reranker.score(item["query"], [c["text"] for c in fan])
        order = np.argsort(scores)[::-1]
        rerank_rank = kw_rank([fan[int(i)] for i in order])

        if rerank_rank and rerank_rank <= args.k:
            stage = "hit"
        elif not exact_rank or exact_rank > args.fan:
            stage = "bi"  # never reached the reranker
        else:
            stage = "ce"  # reranker demoted it out of top-k
        stage_counts[stage] += 1
        rows.append((stage, exact_rank, rerank_rank, item))
        if args.misses_only and stage == "hit":
            continue
        print(
            f"[{stage.upper():4s}] exact={exact_rank or '>'+str(args.exact_k):>3} "
            f"fan15={'yes' if exact_rank and exact_rank <= args.fan else 'NO ':>3} "
            f"rerank={rerank_rank or '-':>2} | {item['ticker']:5s} "
            f"{item['query'][:60]}"
        )

    n = len(golden)
    print("=" * 60)
    print(
        f"{stage_counts['hit']}/{n} hits | misses: "
        f"{stage_counts['bi']} bi-encoder (target outside fan-{args.fan}), "
        f"{stage_counts['ce']} cross-encoder (demoted from fan)"
    )


if __name__ == "__main__":
    main()
