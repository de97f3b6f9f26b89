"""Retrieval-quality evaluator: Hit@k and MRR over the golden set.

Same methodology as the reference harness (/root/reference/evaluate.py):
embed each golden query, search the index top-k with the ticker filter,
mark the first rank whose chunk text contains any expected keyword
(substring, case-insensitive), report Hit@k %, MRR, and average search
latency.  Two deliberate fixes over the reference:

- the evaluator uses THE SERVING EMBEDDER (the reference evaluated with
  all-MiniLM-L6-v2 while serving used BGE-small — evaluate.py:22 vs
  main.py:84 — an inconsistency SURVEY.md flags);
- it can also score the full two-stage pipeline (--two-stage) with the
  reranker in the loop.

With no EDGAR egress the corpus comes from the deterministic synthetic
generator; point an INDEX_DIR env at a persisted real index to evaluate
that instead.

Usage: python evaluate.py [--k 5] [--corpus 2048] [--two-stage]
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np


def build_index(
    n_chunks: int, embedder, use_pallas: bool, *, hard: bool = False,
    token_store: bool = False, chunk_chars: int | None = None,
):
    from financial_rag_system_tpu.data.synthetic import (
        make_corpus,
        make_hard_corpus,
    )
    from financial_rag_system_tpu.index.flat import FlatIndex

    maker = make_hard_corpus if hard else make_corpus
    ids, texts, payloads = maker(n_chunks, chunk_chars=chunk_chars)
    import jax.numpy as jnp

    from financial_rag_system_tpu.utils.config import get_config

    # RAG_TPU_INDEX_DTYPE=int8 evaluates the quantized tier's retrieval
    # quality (symmetric row/query int8 — serving's exact configuration);
    # read through the config layer so evaluate and serving can never
    # interpret the knob differently
    dtype = jnp.dtype(get_config().index_dtype)
    extra = {}
    if token_store:
        # device token store: what the fused serving engine reranks from
        # (--serving-path evaluates THAT pipeline, not the staged one)
        extra = dict(
            token_store_len="auto",  # sized at ingest from measured p99
            tokenizer=getattr(embedder, "tokenizer", None),
        )
    index = FlatIndex(
        dim=embedder.dim, capacity=max(n_chunks, 1024),
        tile=min(1024, max(128, n_chunks // 4 // 128 * 128 or 128)),
        use_pallas=use_pallas, dtype=dtype, **extra,
    )
    bs = 512
    for s in range(0, len(ids), bs):
        sl = slice(s, s + bs)
        index.upsert(ids[sl], embedder.encode(texts[sl]), texts[sl], payloads[sl])
    return index


def _encoder_cfg(arch: str):
    from financial_rag_system_tpu.models import bert

    if arch == "bge":
        # the FULL serving architecture (BAAI/bge-small-en-v1.5 shape,
        # reference main.py:84) — ~33M params, a trivial fit for one v5e
        return bert.BGE_SMALL
    return bert.BertConfig(
        vocab_size=30522, hidden=128, layers=4, heads=4, intermediate=256,
        max_positions=128, with_pooler=True,
    )


def _reranker_cfg(arch: str):
    from financial_rag_system_tpu.models import bert

    if arch == "bge":
        # full cross-encoder architecture (ms-marco MiniLM-L-6 shape,
        # reference main.py:86-90)
        return bert.MINILM_L6_CROSS
    return bert.BertConfig(
        vocab_size=30522, hidden=128, layers=2, heads=4, intermediate=256,
        max_positions=256, with_pooler=True, num_labels=1,
    )


def trained_encoder(
    *, steps: int = 150, seed: int = 0, lr: float | None = None,
    arch: str = "compact", hard_negatives: bool = False,
    filler_negatives: bool = False, neg_weight: float = 1.0,
    chunk_chars: int | None = None,
):
    """Contrastively fine-tuned BERT bi-encoder (random init, no egress).

    Trains on (paraphrase, positive) pairs whose WORDING is disjoint
    from the hard eval queries (data/synthetic.py TRAIN_PARAPHRASES) —
    the no-egress stand-in for the reference's pretrained BGE weights
    (reference main.py:84): it demonstrates a *learned* dense retriever
    through the full train->index->serve loop rather than the lexical
    hash stand-in.  ``arch="bge"`` trains the FULL serving architecture
    (12L/384/30522); "compact" is the fast 4-layer tower for hermetic
    runs.
    """
    import jax

    from financial_rag_system_tpu.data.synthetic import (
        make_filler_triples,
        make_train_pairs,
        make_train_triples,
    )
    from financial_rag_system_tpu.models import bert
    from financial_rag_system_tpu.models.embedder import BiEncoder
    from financial_rag_system_tpu.models.tokenizer import Tokenizer
    from financial_rag_system_tpu.train.contrastive import train

    cfg = _encoder_cfg(arch)
    if lr is None:
        lr = 1e-4 if arch == "bge" else 3e-4
    params = bert.init_params(jax.random.PRNGKey(seed), cfg)
    # hard_negatives: train stage 1 against the bait confusables too
    # (make_train_triples) — one explicit negative per pair in the
    # InfoNCE pool, targeting the filtered-top-15 exact ceiling.
    # filler_negatives: repel the corpus note-boilerplate genre instead
    # (make_filler_triples) — genuinely off-topic, so repulsion helps
    # where the bait triples measured negative (canonical: w=0.5 →
    # hard 100%/0.753; w=1.0 also 100% Hit@5 but 0.709 MRR)
    if hard_negatives:
        pairs: list[tuple[str, ...]] = make_train_triples(
            chunk_chars=chunk_chars
        )
    elif filler_negatives:
        pairs = make_filler_triples(chunk_chars=chunk_chars)
    else:
        pairs = make_train_pairs(chunk_chars=chunk_chars)
    epochs = max(1, (steps * 32) // len(pairs))
    t0 = time.time()
    params, losses = train(
        params, cfg, pairs, epochs=epochs, batch_size=32, lr=lr, seed=seed,
        neg_weight=neg_weight,
    )
    print(
        f"trained {arch} encoder ({cfg.layers}L/{cfg.hidden}) "
        f"{len(losses)} steps on {len(pairs)} pairs in "
        f"{time.time()-t0:.0f}s: loss {losses[0]:.3f} -> {losses[-1]:.3f}"
    )
    return BiEncoder(params, cfg, Tokenizer(), pooling="cls", max_len=64)


def trained_reranker(
    *, steps: int = 150, seed: int = 1, lr: float = 1e-4,
    arch: str = "compact", chunk_chars: int | None = None,
):
    """Cross-encoder head trained on paraphrase positives + bait hard
    negatives (train/cross_encoder.py) — gives the hard-mode two-stage
    eval a LEARNED stage 2 (the reference's is pretrained ms-marco,
    main.py:86-90)."""
    import jax

    from financial_rag_system_tpu.models import bert
    from financial_rag_system_tpu.models.reranker import CrossEncoderReranker
    from financial_rag_system_tpu.models.tokenizer import Tokenizer
    from financial_rag_system_tpu.train.cross_encoder import (
        make_cross_examples,
        train_cross_encoder,
    )

    cfg = _reranker_cfg(arch)
    params = bert.init_params(jax.random.PRNGKey(seed), cfg)
    examples = make_cross_examples(seed=seed, chunk_chars=chunk_chars)
    epochs = max(1, (steps * 32) // len(examples))
    t0 = time.time()
    # ONE length for train and serve: positions past the trained length
    # stay random init, so the serving reranker (and the exported
    # max_seq_length) must truncate exactly where training did.  At
    # realistic chunk lengths (--chunk-chars 1000) the pair no longer
    # fits 128, so size it the way ingest sizes the token store: p99
    # measured pair wordpieces, rounded up (index/flat.auto_token_width)
    # and capped at the architecture's positions — the reranker then
    # trains and serves untruncated at the reference's pair shape
    # (reference main.py:241-247 reranks full chunk text)
    max_len = 128
    if chunk_chars:
        from financial_rag_system_tpu.index.flat import auto_token_width
        from financial_rag_system_tpu.models.tokenizer import Tokenizer as _Tk

        _tk = _Tk()
        lens = [
            len(_tk.tokenize_ids(q)) + len(_tk.tokenize_ids(c)) + 3
            for q, c, _ in examples
        ]
        max_len = min(
            cfg.max_positions,
            max(128, auto_token_width(lens, cap=cfg.max_positions,
                                      multiple=32)),
        )
        print(f"reranker max_len auto-sized to {max_len} "
              f"(p99 pair wordpieces at chunk_chars={chunk_chars})")
    params, losses = train_cross_encoder(
        params, cfg, examples, epochs=epochs, batch_size=32, lr=lr,
        max_len=max_len, seed=seed,
    )
    print(
        f"trained {arch} reranker ({cfg.layers}L/{cfg.hidden}) "
        f"{len(losses)} steps on {len(examples)} pairs in "
        f"{time.time()-t0:.0f}s: loss {losses[0]:.3f} -> {losses[-1]:.3f}"
    )
    return CrossEncoderReranker(params, cfg, Tokenizer(), max_len=max_len)


def save_trained(embedder, reranker, out_dir: str) -> None:
    """Export both trained models as HF-format checkpoints so serving
    picks them up via RAG_TPU_BGE_DIR / RAG_TPU_RERANKER_DIR
    (models/hf_export.py; Tokenizer.from_dir falls back to the hash
    vocab they were trained with)."""
    from financial_rag_system_tpu.models.hf_export import save_bert_checkpoint

    bge_dir = os.path.join(out_dir, "bge")
    rr_dir = os.path.join(out_dir, "reranker")
    save_bert_checkpoint(
        embedder.params, embedder.cfg, bge_dir,
        max_seq_length=embedder.max_len,
    )
    if reranker is not None:
        save_bert_checkpoint(
            reranker.params, reranker.cfg, rr_dir, cross_encoder=True,
            max_seq_length=reranker.max_len,
        )
    print(f"exported trained checkpoints: RAG_TPU_BGE_DIR={bge_dir}"
          + (f" RAG_TPU_RERANKER_DIR={rr_dir}" if reranker else ""))


def run_evaluation(
    k: int = 5, n_chunks: int = 2048, two_stage: bool = False,
    tier: str = "flat", hard: bool = False, embedder=None, reranker=None,
    index=None, serving_path: bool = False, chunk_chars: int | None = None,
):
    from financial_rag_system_tpu.data.synthetic import (
        GOLDEN_SET,
        make_hard_set,
    )
    from financial_rag_system_tpu.models.embedder import get_embedder
    from financial_rag_system_tpu.models.reranker import get_reranker
    from financial_rag_system_tpu.index.flat import FlatIndex

    golden = make_hard_set() if hard else GOLDEN_SET
    embedder = embedder or get_embedder()
    index_dir = os.environ.get("INDEX_DIR", "")
    use_pallas = os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)
    if index is not None:
        pass  # caller-built flat index (--report full reuses one build)
    elif index_dir and os.path.exists(os.path.join(index_dir, "flat_index.npz")):
        index = FlatIndex.load(index_dir)
        print(f"loaded index from {index_dir}: {index.n_valid} chunks")
    else:
        index = build_index(
            n_chunks, embedder, use_pallas, hard=hard,
            token_store=serving_path, chunk_chars=chunk_chars,
        )
        print(f"built synthetic corpus: {index.n_valid} chunks"
              + (" (hard mode)" if hard else "")
              + (f" (chunk_chars={chunk_chars})" if chunk_chars else ""))
    if tier == "ivf":
        from financial_rag_system_tpu.index.ivf import IVFIndex

        index = IVFIndex(index, tile=min(index.tile, 128))
        print(f"ivf tier: {index.n_clusters} clusters, nprobe={index.nprobe}")
    elif tier == "hnsw":
        from financial_rag_system_tpu.index.hnsw import HNSWIndex

        graph_file = os.path.join(index_dir or "", HNSWIndex.GRAPH_FILE)
        if index_dir and os.path.exists(graph_file):
            # reuse the saved graph (35-96 min to rebuild at 1M rows)
            index = HNSWIndex.load(index_dir, index)
            state = index._graph_state
            print(f"hnsw tier: loaded graph from {index_dir} "
                  f"(hier={'yes' if state[6] is not None else 'no'}, "
                  f"pool={state[7][3] if state[7] is not None else 0} seeds)")
        else:
            index = HNSWIndex(index)
            print(f"hnsw tier: native={index.native_built}")
        print(f"hnsw tier: ef={index.ef}")
    elif tier in ("sharded", "sharded-ivf", "sharded-hnsw"):
        from financial_rag_system_tpu.index.sharded import ShardedFlatIndex
        from financial_rag_system_tpu.parallel.mesh import create_mesh

        mesh = create_mesh()
        sharded = ShardedFlatIndex(
            mesh, dim=embedder.dim, capacity=index.n_valid,
            tile=min(128, index.tile), use_pallas=use_pallas,
            dtype=index.dtype,
        )
        sharded.upsert(
            list(index.store.id_to_row.keys()),
            np.asarray(index._emb[: index.n_valid], np.float32),
            index.store.texts[: index.n_valid],
            index.store.payloads[: index.n_valid],
        )
        index = sharded
        if tier == "sharded-ivf":
            from financial_rag_system_tpu.index.sharded_ivf import (
                ShardedIVFIndex,
            )

            index = ShardedIVFIndex(sharded, tile=min(128, sharded.tile))
            print(f"sharded-ivf tier: {index.n_clusters} clusters x "
                  f"{index.n_shards} shards")
        elif tier == "sharded-hnsw":
            from financial_rag_system_tpu.index.sharded_hnsw import (
                ShardedHNSWIndex,
            )

            index = ShardedHNSWIndex(sharded)
            print(f"sharded-hnsw tier: {index.n_shards} graphs, "
                  f"ef={index.ef}, steps={index.steps}")
        else:
            print(f"sharded tier: {sharded.n_shards} shards")
    if two_stage:
        reranker = reranker or get_reranker()
    else:
        reranker = None

    engine = None
    if serving_path:
        # evaluate THROUGH the serving engine's fused batch path — the
        # pipeline users actually hit (one device program: embed ->
        # masked top-k -> token gather -> on-device rerank), so the
        # reported avg latency is the serving path's, not the staged
        # harness's (the reference's third metric is measured on its
        # real serving tier, /root/reference/evaluate.py:116-126)
        from financial_rag_system_tpu.serving.engine import RAGEngine
        from financial_rag_system_tpu.utils.config import Config

        engine = RAGEngine(
            Config(
                testing=True, database_url=":memory:",
                embed_dim=embedder.dim, retrieve_k=15 if two_stage else k,
            ),
            index, embedder, reranker or get_reranker(),
            mode="sequential",
        )
        if engine._fused_fn is None:
            raise SystemExit(
                "--serving-path: no fused program for this "
                "embedder/index combination (needs a token store for "
                "the full stack — INDEX_DIR caches lack one)"
            )
        print(f"serving path: fused kind={engine._fused_kind}")

    hits, rrs, total_latency = 0, [], 0.0
    fan_k = 15 if two_stage else k
    fused_misses = 0
    for item in golden:
        t0 = time.time()
        if engine is not None:
            res = engine._fused_batch([item["query"]], [(item["ticker"], None)])
            if res is None:  # staged fallback (selective filter etc.)
                fused_misses += 1
                vec = embedder.encode([item["query"]])
                cands = index.search(vec, ticker=item["ticker"], k=fan_k)[0]
            else:
                cands = res[0][1]
            if two_stage and cands and "rerank_score" in cands[0]:
                cands = sorted(
                    cands, key=lambda h: -h["rerank_score"]
                )[:k]
            elif two_stage and cands:
                scores = reranker.score(
                    item["query"], [c["text"] for c in cands]
                )
                order = np.argsort(scores)[::-1][:k]
                cands = [cands[int(i)] for i in order]
        else:
            vec = embedder.encode([item["query"]])
            cands = index.search(vec, ticker=item["ticker"], k=fan_k)[0]
            if two_stage and cands:
                scores = reranker.score(
                    item["query"], [c["text"] for c in cands]
                )
                order = np.argsort(scores)[::-1][:k]
                cands = [cands[int(i)] for i in order]
        latency = (time.time() - t0) * 1000
        total_latency += latency

        found_at = 0
        for rank, hit in enumerate(cands[:k], start=1):
            text = hit["text"].lower()
            if any(kw.lower() in text for kw in item["expected_keywords"]):
                found_at = rank
                break
        if found_at:
            hits += 1
            rrs.append(1.0 / found_at)
            print(f"[HIT ] rank {found_at} | {latency:6.1f} ms | {item['query'][:55]}")
        else:
            rrs.append(0.0)
            print(f"[MISS]        | {latency:6.1f} ms | {item['query'][:55]}")

    n = len(golden)
    hit_rate = 100.0 * hits / n
    mrr = sum(rrs) / n
    avg_ms = total_latency / n
    print("=" * 60)
    print(f"Hit@{k}: {hit_rate:.1f}%   MRR: {mrr:.3f}   avg search: {avg_ms:.1f} ms")
    if engine is not None:
        print(f"(fused serving path; staged fallbacks: {fused_misses}/{n})")
    print("=" * 60)
    return {"hit_rate": hit_rate, "mrr": mrr, "avg_latency_ms": avg_ms}


if __name__ == "__main__":
    from financial_rag_system_tpu.utils.config import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--corpus", type=int, default=None,
                    help="corpus size (default 2048, 65536 in --hard mode)")
    ap.add_argument("--two-stage", action="store_true")
    ap.add_argument("--tier",
                    choices=("flat", "ivf", "hnsw", "sharded", "sharded-ivf",
                             "sharded-hnsw"),
                    default="flat",
                    help="index tier under evaluation")
    ap.add_argument("--hard", action="store_true",
                    help="56 paraphrase queries + keyword-sharing "
                         "distractors over a 64k corpus (headroom mode)")
    ap.add_argument("--trained", action="store_true",
                    help="contrastively fine-tune a BERT bi-encoder on "
                         "paraphrase pairs (disjoint from the eval "
                         "queries) and evaluate THAT instead of the "
                         "default embedder; implies --hard.  With "
                         "--two-stage, a cross-encoder reranker is "
                         "trained too (bait hard negatives)")
    ap.add_argument("--trained-arch", choices=("compact", "bge"),
                    default="compact",
                    help="compact = fast 4L/128 tower (hermetic CI); "
                         "bge = the FULL serving architectures "
                         "(12L/384 BGE-small + 6L MiniLM cross-encoder)")
    ap.add_argument("--train-steps", type=int, default=150)
    ap.add_argument("--hard-negatives", action="store_true",
                    help="train the bi-encoder on (query, positive, bait) "
                         "triples: explicit hard negatives in the InfoNCE "
                         "pool (data/synthetic.py make_train_triples)")
    ap.add_argument("--filler-negatives", action="store_true",
                    help="train the bi-encoder on (query, positive, "
                         "filler-note) triples: repel the corpus "
                         "boilerplate genre (data/synthetic.py "
                         "make_filler_triples)")
    ap.add_argument("--neg-weight", type=float, default=1.0,
                    help="denominator weight of the explicit hard negatives "
                         "(log-additive discount; 1.0 = full strength)")
    ap.add_argument("--save-trained", metavar="DIR", default="",
                    help="export the trained model(s) as HF checkpoints "
                         "for serving via RAG_TPU_BGE_DIR / "
                         "RAG_TPU_RERANKER_DIR")
    ap.add_argument("--distill", type=int, default=0, metavar="STEPS",
                    help="after both trainers, refine the bi-encoder for "
                         "STEPS Margin-MSE steps against the trained "
                         "cross-encoder's pairwise margins "
                         "(train/distill.py; requires --two-stage)")
    ap.add_argument("--distill-triples", choices=("both", "bait", "filler"),
                    default="both",
                    help="which triple sets feed the distillation: bait "
                         "near-duplicates, filler-genre notes, or both")
    ap.add_argument("--distill-temp", type=float, default=0.05,
                    help="distillation temperature: the student's cosine "
                         "margin divides by this before regressing onto "
                         "the teacher's logit margin, so it sets how much "
                         "geometric separation a given teacher margin "
                         "demands (lower = gentler geometry distortion)")
    ap.add_argument("--serving-path", action="store_true",
                    help="evaluate through the serving engine's FUSED "
                         "batch program (embed->search->gather->rerank, "
                         "one device dispatch) instead of the staged "
                         "harness — quality AND latency of the path "
                         "users hit; builds the corpus with the device "
                         "token store")
    ap.add_argument("--chunk-chars", type=int, default=0,
                    help="pad synthetic chunks toward this many chars "
                         "(reference ingest.py emits 1000-char chunks; "
                         "0 = legacy ~150-char corpus).  Applies "
                         "identically to the corpus builders AND every "
                         "trainer's supervision, and auto-sizes the "
                         "trained reranker's pair length")
    ap.add_argument("--report", choices=("one", "full"), default="one",
                    help="full = evaluate BOTH gates (hard 64k + easy "
                         "2048) single- AND two-stage from the one "
                         "trained stack, reusing each corpus build — "
                         "the both-gates discipline in one command")
    args = ap.parse_args()
    hard = args.hard or args.trained
    corpus = args.corpus or (65536 if hard else 2048)
    emb, rr = None, None
    chunk_chars = args.chunk_chars or None
    if args.trained:
        emb = trained_encoder(
            steps=args.train_steps, arch=args.trained_arch,
            hard_negatives=args.hard_negatives,
            filler_negatives=args.filler_negatives,
            neg_weight=args.neg_weight, chunk_chars=chunk_chars,
        )
        if args.two_stage:
            rr = trained_reranker(
                steps=args.train_steps, arch=args.trained_arch,
                chunk_chars=chunk_chars,
            )
        if args.distill and rr is not None:
            from financial_rag_system_tpu.data.synthetic import (
                make_filler_triples,
                make_train_triples,
            )
            from financial_rag_system_tpu.train.distill import distill

            triples = []
            if args.distill_triples in ("both", "bait"):
                triples += make_train_triples()
            if args.distill_triples in ("both", "filler"):
                triples += make_filler_triples()
            t0 = time.time()
            emb.params, dlosses = distill(
                emb.params, emb.cfg, rr.params, rr.cfg, triples,
                steps=args.distill, teacher_max_len=rr.max_len,
                max_len=emb.max_len, temperature=args.distill_temp,
            )
            print(
                f"distilled cross-encoder margins into the bi-encoder: "
                f"{len(dlosses)} steps on {len(triples)} triples in "
                f"{time.time()-t0:.0f}s, loss "
                f"{dlosses[0]:.3f} -> {dlosses[-1]:.3f}"
            )
        if args.save_trained:
            save_trained(emb, rr, args.save_trained)
        if args.trained_arch != "bge":
            corpus = min(corpus, args.corpus or 8192)  # CPU-feasible embed
    if args.report == "full":
        from financial_rag_system_tpu.models.embedder import get_embedder
        from financial_rag_system_tpu.models.reranker import get_reranker

        emb = emb or get_embedder()
        rr = rr or get_reranker()
        use_pallas = os.environ.get("JAX_PLATFORMS", "") not in ("cpu",)
        results = {}
        for gate, n_c in (("hard", corpus), ("easy", args.corpus or 2048)):
            t0 = time.time()
            idx = build_index(n_c, emb, use_pallas, hard=gate == "hard",
                              chunk_chars=chunk_chars)
            print(f"[{gate}] corpus built: {idx.n_valid} chunks in "
                  f"{time.time()-t0:.0f}s", flush=True)
            for stage, two in (("single", False), ("two", True)):
                print(f"--- {gate} / {stage}-stage ---", flush=True)
                results[f"{gate}_{stage}"] = run_evaluation(
                    args.k, n_c, two, tier=args.tier, hard=gate == "hard",
                    embedder=emb, reranker=rr if two else None, index=idx,
                )
        print("== full report ==")
        for name, r in results.items():
            print(f"{name:12s} Hit@{args.k} {r['hit_rate']:5.1f}%  "
                  f"MRR {r['mrr']:.3f}")
    else:
        run_evaluation(args.k, corpus, args.two_stage, tier=args.tier,
                       hard=hard, embedder=emb, reranker=rr,
                       serving_path=args.serving_path,
                       chunk_chars=chunk_chars)
