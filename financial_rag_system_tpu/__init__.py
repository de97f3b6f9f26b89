"""financial_rag_system_tpu — a TPU-native financial RAG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
pythonmailer/financial-rag-system reference stack (SEC-filings RAG:
ingestion -> two-stage retrieval -> LLM generation -> serving), built
TPU-first:

- The vector index lives in device HBM; search is a fused Pallas
  masked-matmul + streaming top-k kernel (replaces the reference's
  Qdrant server; reference main.py:215-239).
- The bi-encoder (BGE-small architecture) and cross-encoder reranker
  (MiniLM architecture) are pure-JAX forward passes jit-compiled with
  bucketed static shapes (replaces sentence-transformers/torch;
  reference main.py:80-90).
- Large corpora shard over a `jax.sharding.Mesh` along the corpus dim:
  per-shard top-k then all-gather merge over ICI (the reference has no
  multi-device story at all; see SURVEY.md §5.8).
- The serving shell keeps the reference's behavioral surface exactly:
  dynamic 50 ms / 32-request batching, exact-match SHA-256 cache,
  SIMPLE/COMPLEX routing, circuit breaker, degraded answers, the same
  endpoints and response schema (reference main2.py).
"""

from financial_rag_system_tpu.version import __version__

__all__ = ["__version__"]
