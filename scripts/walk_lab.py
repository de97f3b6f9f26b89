"""Host-side HNSW walk laboratory: replay the device walk (and candidate
redesigns) in NumPy against a cached trained-embedding corpus + graph
(scripts/build_trained_cache.py), measuring candidate recall against
exact ground truth — iterate on routing in seconds, validate on chip
once.

Why: at 1M rows the trained-encoder hard eval holds 89.3% Hit@5 on the
flat tier but collapsed to 8.9% on HNSW (ef=64).  The measured geometry
(scripts/diag_trained_geometry.py) shows 56 positives + 168 baits as
extreme outlier islands in a 1M-row filler cloud with ~zero similarity
gradient from cloud to island — the regime where the *hierarchy* (lost
in the flat level-0 export) must provide long-range routing.

Variants:
  flat      — the shipping walk: level-0 beam from the fixed top-level
              entry sample (index/hnsw.py hnsw_walk semantics, faithful
              ring-visited + fixed steps/frontier).
  descent   — coarse-to-fine: greedy/beam walk down the exported upper
              levels (hier.npz), whose survivors seed the level-0 walk
              per query.

Usage:
  python scripts/walk_lab.py --cache ~/.cache/frs_eval/1m_trained \
      [--variant flat|descent|both] [--ef 64] [--steps 16] [--frontier 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

NEG = np.float32(-3.0e38)


class Lab:
    def __init__(self, cache: str):
        cache = os.path.expanduser(cache)
        from financial_rag_system_tpu.index.flat import FlatIndex

        self.flat = FlatIndex.load(cache)
        n = self.flat.n_valid
        self.emb = np.asarray(self.flat._emb[:n], np.float32)
        if getattr(self.flat, "quantized", False):
            self.emb = self.emb / 127.0
        g = np.load(os.path.join(cache, "hnsw_graph.npz"))
        self.adj, self.entries = g["adj"], g["entries"]
        hz = np.load(os.path.join(cache, "hier.npz"))
        self.hi_ids, self.hi_levels, self.hi_adj = (
            hz["hi_ids"], hz["hi_levels"], hz["hi_adj"])
        self.meta = json.load(open(os.path.join(cache, "meta.json")))
        self.q = np.load(os.path.join(cache, "queries.npy"))
        from financial_rag_system_tpu.data.synthetic import make_hard_set

        golden = make_hard_set()
        # per-query ticker code + the positive's row id
        payloads = self.flat.store.payloads[:n]
        tickers = np.array([p["ticker"] for p in payloads])
        srcs = np.array([p["source_file"] for p in payloads])
        self.q_tick, self.target = [], []
        for gq in golden:
            self.q_tick.append(gq["ticker"])
            rows = np.where(
                (tickers == gq["ticker"])
                & (srcs == f"hard_{gq['intent']}")
            )[0]
            assert len(rows) == 1
            self.target.append(int(rows[0]))
        self.tick_ok = np.stack(
            [tickers == t for t in self.q_tick]
        )  # (Q, N) bool
        self.n = n
        print(f"lab: n={n}, hi={len(self.hi_ids)}, levels={self.hi_adj.shape[0]},"
              f" q={len(self.q)}")

    def ground_truth(self, k: int = 15) -> np.ndarray:
        sims = self.q @ self.emb.T  # (Q, N)
        sims[~self.tick_ok] = NEG
        return np.argsort(-sims, axis=1)[:, :k]

    # ---- faithful replay of hnsw_walk (index/hnsw.py) ------------------
    def walk0(self, seeds: np.ndarray, *, k: int, ef: int, steps: int,
              frontier: int) -> tuple[np.ndarray, np.ndarray]:
        """seeds (Q, E) global ids (may contain pad == n).  Returns
        (res_i (Q, k) filtered results, explored count per q)."""
        n = self.n
        Q, E = seeds.shape
        m0 = self.adj.shape[1]
        adj_pad = np.concatenate(
            [np.where(self.adj < 0, n, self.adj),
             np.full((1, m0), n, np.int32)])
        embp = np.concatenate([self.emb, np.zeros((1, self.emb.shape[1]),
                                                  np.float32)])

        def score(ids, qi):
            s = embp[ids] @ self.q[qi]
            return np.where(ids == n, NEG, s)

        res = np.full((Q, k), -1, np.int64)
        explored = np.zeros(Q, np.int64)
        for qi in range(Q):
            beam_ids = np.full(ef, n, np.int64)
            beam_ids[:E] = seeds[qi]
            beam_s = score(beam_ids, qi)
            expanded = beam_ids == n
            ring = set(int(x) for x in beam_ids if x != n)
            ok = self.tick_ok[qi]
            rs = np.full(k, NEG, np.float32)
            ri = np.full(k, -1, np.int64)

            def acc(ids, s):
                nonlocal rs, ri
                f = np.where((ids != n) & ok[np.minimum(ids, n - 1)]
                             & (ids < n), s, NEG)
                cs = np.concatenate([rs, f])
                ci = np.concatenate([ri, np.where(f > NEG, ids, -1)])
                top = np.argsort(-cs)[:k]
                rs, ri = cs[top], ci[top]

            acc(beam_ids, beam_s)
            for t in range(steps):
                sel = np.where(expanded, NEG, beam_s)
                slot = np.argsort(-sel)[:frontier]
                src = beam_ids[slot]
                src = np.where(sel[slot] > NEG, src, n)
                expanded[slot] = True
                cand = adj_pad[src].reshape(-1)
                cand = np.array([c if c not in ring else n for c in cand])
                ring.update(int(c) for c in cand if c != n)
                explored[qi] += (cand != n).sum()
                cs = score(cand, qi)
                acc(cand, cs)
                alls = np.concatenate([beam_s, cs])
                alli = np.concatenate([beam_ids, cand])
                alle = np.concatenate([expanded, cand == n])
                top = np.argsort(-alls)[:ef]
                beam_ids, beam_s, expanded = alli[top], alls[top], alle[top]
            res[qi] = ri
        return res, explored

    # ---- hierarchy descent ---------------------------------------------
    def descend(self, *, beam: int = 16, steps_per_level: int = 4,
                frontier: int = 4) -> np.ndarray:
        """Walk the upper levels coarse-to-fine; returns (Q, beam) global
        seed ids for the level-0 walk."""
        hi_ids, hi_levels, hi_adj = self.hi_ids, self.hi_levels, self.hi_adj
        H = len(hi_ids)
        L = hi_adj.shape[0]
        m = hi_adj.shape[2]
        hi_emb = self.emb[hi_ids]  # (H, D)
        Q = len(self.q)
        seeds = np.zeros((Q, beam), np.int64)  # hi-local
        out = np.full((Q, beam), self.n, np.int64)
        for qi in range(Q):
            qv = self.q[qi]
            # start: the top-level nodes (first few in level-sorted order)
            n_top = int((hi_levels >= L).sum()) or 1
            cur = np.unique(np.arange(min(n_top, beam)))
            for level in range(L, 0, -1):
                n_l = int((hi_levels >= level).sum())
                adj = hi_adj[level - 1]
                # beam search at this level, hi-local ids < n_l
                cand_set = set(int(c) for c in cur)
                beam_ids = np.array(sorted(cand_set), np.int64)
                beam_s = hi_emb[beam_ids] @ qv
                expanded = np.zeros(len(beam_ids), bool)
                for _ in range(steps_per_level):
                    sel = np.where(expanded, NEG, beam_s)
                    f = min(frontier, len(beam_ids))
                    slot = np.argsort(-sel)[:f]
                    new = []
                    for s_ in slot:
                        if sel[s_] <= NEG:
                            continue
                        expanded[s_] = True
                        for nb in adj[beam_ids[s_]]:
                            if nb >= 0 and int(nb) not in cand_set:
                                cand_set.add(int(nb))
                                new.append(int(nb))
                    if not new:
                        break
                    new = np.array(new, np.int64)
                    ns = hi_emb[new] @ qv
                    beam_ids = np.concatenate([beam_ids, new])
                    beam_s = np.concatenate([beam_s, ns])
                    expanded = np.concatenate(
                        [expanded, np.zeros(len(new), bool)])
                    top = np.argsort(-beam_s)[:beam]
                    beam_ids, beam_s = beam_ids[top], beam_s[top]
                    expanded = expanded[top]
                cur = beam_ids  # survivors seed the next level down
            k = min(beam, len(cur))
            out[qi, :k] = hi_ids[cur[:k]]
        return out

    def report(self, name: str, res: np.ndarray, gt: np.ndarray,
               explored: np.ndarray | None = None) -> None:
        k = gt.shape[1]
        rec, tgt = [], 0
        for qi in range(len(gt)):
            got = set(int(x) for x in res[qi] if x >= 0)
            rec.append(len(got & set(map(int, gt[qi]))) / k)
            tgt += int(self.target[qi] in got)
        ex = f"  explored(avg)={explored.mean():.0f}" if explored is not None else ""
        print(f"{name:34s} recall@{k}={np.mean(rec):.3f}  "
              f"target-in-cands={tgt}/{len(gt)}{ex}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cache", required=True)
    ap.add_argument("--variant", default="both",
                    choices=("flat", "descent", "both"))
    ap.add_argument("--k", type=int, default=15)
    ap.add_argument("--ef", type=int, default=64)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--frontier", type=int, default=8)
    ap.add_argument("--entries", type=int, default=32)
    ap.add_argument("--dbeam", type=int, default=16)
    ap.add_argument("--dsteps", type=int, default=4)
    args = ap.parse_args()

    lab = Lab(args.cache)
    t0 = time.time()
    gt = lab.ground_truth(args.k)
    print(f"ground truth in {time.time()-t0:.1f}s")

    if args.variant in ("flat", "both"):
        ent = lab.entries[: args.entries]
        seeds = np.broadcast_to(ent, (len(lab.q), len(ent))).astype(np.int64)
        t0 = time.time()
        res, ex = lab.walk0(seeds, k=args.k, ef=args.ef, steps=args.steps,
                            frontier=args.frontier)
        lab.report(
            f"flat ef={args.ef} s={args.steps} f={args.frontier}",
            res, gt, ex)
        print(f"  ({time.time()-t0:.1f}s)")
    if args.variant in ("descent", "both"):
        t0 = time.time()
        seeds = lab.descend(beam=args.dbeam, steps_per_level=args.dsteps)
        res, ex = lab.walk0(seeds, k=args.k, ef=args.ef, steps=args.steps,
                            frontier=args.frontier)
        lab.report(
            f"descent b={args.dbeam} ds={args.dsteps} + ef={args.ef}",
            res, gt, ex)
        print(f"  ({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
