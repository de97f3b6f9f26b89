"""Embed the hard corpus with the serving encoder ONCE, build the native
HNSW graph ONCE, and cache flat index + graph + hierarchy + query
embeddings to disk — so index/routing experiments iterate in seconds
instead of paying ~10 min of chip embedding + ~35 min of graph build
per attempt (1M rows, 1-CPU rig).

Artifacts in --out:
  flat_index.npz / store.npz   FlatIndex.save (embeddings + payloads)
  hnsw_graph.npz               level-0 adjacency + entries (HNSWIndex.load)
  hier.npz                     hi_ids / hi_levels / hi_adj upper levels
  queries.npy                  (56, D) hard-set query embeddings
  meta.json                    corpus size, m, efc, build seconds

Usage:
  RAG_TPU_BGE_DIR=... python scripts/build_trained_cache.py \
      --corpus 1048576 --out ~/.cache/frs_eval/1m_trained [--m 16 --efc 100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=1_048_576)
    ap.add_argument("--out", required=True)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--efc", type=int, default=100)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    out = os.path.expanduser(args.out)
    os.makedirs(out, exist_ok=True)

    from evaluate import build_index
    from financial_rag_system_tpu.data.synthetic import make_hard_set
    from financial_rag_system_tpu.models.embedder import get_embedder
    from financial_rag_system_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    emb = get_embedder()
    golden = make_hard_set()

    t0 = time.time()
    if os.path.exists(os.path.join(out, "flat_index.npz")):
        from financial_rag_system_tpu.index.flat import FlatIndex

        index = FlatIndex.load(out)
        print(f"flat index loaded: {index.n_valid} rows", flush=True)
    else:
        index = build_index(args.corpus, emb, use_pallas=True, hard=True)
        index.save(out)
        print(f"embedded+saved {index.n_valid} rows in "
              f"{time.time()-t0:.0f}s", flush=True)
    q = np.asarray(emb.encode([g["query"] for g in golden]), np.float32)
    np.save(os.path.join(out, "queries.npy"), q)

    t1 = time.time()
    from financial_rag_system_tpu.native.hnsw_loader import (
        build_hnsw_graph_handle,
    )

    vecs = np.asarray(index._emb[: index.n_valid], np.float32)
    if getattr(index, "quantized", False):
        vecs = vecs / 127.0
    h = build_hnsw_graph_handle(
        vecs, m=args.m, ef_construction=args.efc, seed=args.seed
    )
    assert h is not None, "native builder unavailable"
    build_s = time.time() - t1
    print(f"graph built in {build_s:.0f}s", flush=True)

    adj = h.adjacency()
    ent = h.entries(64)
    hi_ids, hi_levels, hi_adj = h.hierarchy()
    np.savez(
        os.path.join(out, "hnsw_graph.npz"),
        adj=adj, entries=ent, m=args.m, n_graph=index.n_valid,
        # hierarchy keys: HNSWIndex.load picks these up for the descent
        hi_ids=hi_ids, hi_levels=hi_levels, hi_adj=hi_adj,
    )
    np.savez(
        os.path.join(out, "hier.npz"),
        hi_ids=hi_ids, hi_levels=hi_levels, hi_adj=hi_adj,
    )
    h.close()
    with open(os.path.join(out, "meta.json"), "w") as f:
        json.dump({"corpus": index.n_valid, "m": args.m, "efc": args.efc,
                   "build_s": build_s, "dim": vecs.shape[1]}, f)
    print(f"cached to {out} (hi nodes: {len(hi_ids)}, "
          f"levels: {hi_adj.shape[0]})", flush=True)


if __name__ == "__main__":
    main()
