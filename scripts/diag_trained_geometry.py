"""Geometry probe: what does the TRAINED encoder's embedding space look
like at the 1M hard-corpus scale?

The 1M hard eval (evaluate.py --hard --corpus 1048576) showed the flat
tier at 89.3% Hit@5 but the HNSW tier collapsing to 8.9% with trained
embeddings — while the same graph walk holds 85.7% at 64k and ~0.92
recall@15 at 1M on *synthetic* (hash-spread) vectors.  Hypothesis: the
hard corpus's filler (`data/synthetic._distractor`) is template text
whose trained embeddings collapse into one near-duplicate blob, leaving
the graph without the distance gradients a greedy walk needs.

This probe embeds a sample (filler / baits / positives / queries) with
the serving encoder (RAG_TPU_BGE_DIR or hash fallback) and prints the
pairwise-similarity structure so index design decisions are grounded in
measured geometry, not guesses.

Usage: python scripts/diag_trained_geometry.py [--sample 2048] [--corpus 1048576]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pct(x, qs=(5, 25, 50, 75, 95, 99)):
    v = np.percentile(x, qs)
    return "  ".join(f"p{q}={s:.4f}" for q, s in zip(qs, v))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sample", type=int, default=2048)
    ap.add_argument("--corpus", type=int, default=1_048_576)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from financial_rag_system_tpu.data.synthetic import (
        make_hard_corpus, make_hard_set,
    )
    from financial_rag_system_tpu.models.embedder import get_embedder

    ids, texts, payloads = make_hard_corpus(args.corpus)
    src = np.array([p["source_file"] for p in payloads])
    is_filler = src == "hard_filler"
    pos_rows = np.where(np.char.startswith(src, "hard_"))[0]
    pos_rows = pos_rows[~is_filler[pos_rows]]
    bait_rows = np.where(np.char.startswith(src, "bait_"))[0]
    rng = np.random.default_rng(args.seed)
    filler_rows = rng.choice(np.where(is_filler)[0], args.sample, replace=False)
    print(f"corpus {len(ids)} rows: {len(pos_rows)} positives, "
          f"{len(bait_rows)} baits, {int(is_filler.sum())} filler "
          f"({is_filler.mean():.1%}); sampling {args.sample} filler")

    emb = get_embedder()
    golden = make_hard_set()
    queries = [g["query"] for g in golden]

    def enc(rows_or_texts):
        if isinstance(rows_or_texts, np.ndarray):
            batch = [texts[r] for r in rows_or_texts]
        else:
            batch = rows_or_texts
        out = []
        for i in range(0, len(batch), 256):
            out.append(np.asarray(emb.encode(batch[i: i + 256]), np.float32))
        return np.concatenate(out)

    f = enc(filler_rows)
    p = enc(pos_rows)
    b = enc(bait_rows[: 2048])
    q = enc(queries)
    print(f"encoded: filler{f.shape} pos{p.shape} bait{b.shape} q{q.shape}")

    # filler-filler similarity: the blob test
    ff = f @ f.T
    iu = np.triu_indices(len(f), k=1)
    ffv = ff[iu]
    print(f"\nfiller-filler cos: {pct(ffv)}")
    for thr in (0.95, 0.99, 0.995, 0.999):
        print(f"  frac pairs > {thr}: {(ffv > thr).mean():.4f}")
    # effective duplicate clusters at rounding granularity
    for bits in (6, 8):
        key = np.round(f * (1 << bits)).astype(np.int32)
        uniq = len(np.unique(key, axis=0))
        print(f"  unique after {bits}-bit rounding: {uniq}/{len(f)}")

    pp = p @ p.T
    print(f"\npositive-positive cos: {pct(pp[np.triu_indices(len(p), k=1)])}")
    print(f"filler-positive cos:   {pct((f @ p.T).ravel())}")
    print(f"filler-bait cos:       {pct((f @ b.T).ravel())}")

    # query structure: gradient from blob to target?
    qp = q @ p.T
    qf = q @ f.T
    qb = q @ b.T
    print(f"\nquery-positive max per q: {pct(qp.max(axis=1))}")
    print(f"query-filler  max per q: {pct(qf.max(axis=1))}")
    print(f"query-filler mean per q: {pct(qf.mean(axis=1))}")
    print(f"query-bait    max per q: {pct(qb.max(axis=1))}")
    # margin between the best target and the filler blob ceiling: if
    # negative, brute force itself would fail; if positive but the blob
    # is internally tie-flat, a greedy walk has no path of improving
    # hops from a blob entry to the target.
    print(f"margin (qpos_max - qfill_max): {pct(qp.max(1) - qf.max(1))}")

    # local gradient: for each query, does the blob contain stepping
    # stones?  Correlation between a filler row's sim-to-query and its
    # max sim to any positive: ~0 means no gradient to follow.
    g = []
    for i in range(len(q)):
        fp_max = (f @ p.T).max(axis=1)
        g.append(np.corrcoef(qf[i], fp_max)[0, 1])
    print(f"blob gradient corr(q-sim, pos-sim): {pct(np.asarray(g))}")


if __name__ == "__main__":
    main()
