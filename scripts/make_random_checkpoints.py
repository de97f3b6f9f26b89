"""Generate random-init HF-format BGE-small + MiniLM-cross checkpoints.

Serving-latency profiles (scripts/serving_profile.py) need the REAL
architectures behind RAG_TPU_BGE_DIR / RAG_TPU_RERANKER_DIR — random
init has identical FLOPs/shapes to trained weights, so it prices the
production forward without egress or a 5-min training run.  Uses the
framework's own init + export (models/bert.init_params +
models/hf_export.save_bert_checkpoint); no vocab.txt is written, so the
loaders fall back to the deterministic hash vocab.

    python scripts/make_random_checkpoints.py [--out DIR]

Prints the two env exports to use.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.expanduser("~/.cache/frs_eval/rand_ckpt"))
    ap.add_argument("--max-seq-length", type=int, default=128)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from financial_rag_system_tpu.models import bert
    from financial_rag_system_tpu.models.hf_export import save_bert_checkpoint

    bge_dir = os.path.join(args.out, "bge")
    rr_dir = os.path.join(args.out, "reranker")
    enc = bert.init_params(jax.random.PRNGKey(0), bert.BGE_SMALL)
    save_bert_checkpoint(enc, bert.BGE_SMALL, bge_dir,
                         max_seq_length=args.max_seq_length)
    rr = bert.init_params(jax.random.PRNGKey(1), bert.MINILM_L6_CROSS)
    save_bert_checkpoint(rr, bert.MINILM_L6_CROSS, rr_dir, cross_encoder=True,
                         max_seq_length=args.max_seq_length)
    print(f"export RAG_TPU_BGE_DIR={bge_dir}")
    print(f"export RAG_TPU_RERANKER_DIR={rr_dir}")


if __name__ == "__main__":
    main()
