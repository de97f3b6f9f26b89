# Serving image for the TPU-native financial RAG stack.
#
# Counterpart of the reference image (reference Dockerfile): instead of
# pre-downloading torch models (reference Dockerfile:32-34), this image
# pre-builds the native tokenizer library and pre-compiles the XLA
# programs' python layer; model weights (optional, for BGE/MiniLM parity)
# mount at /models via RAG_TPU_BGE_DIR / RAG_TPU_RERANKER_DIR.
#
# On TPU VMs, run with the host TPU runtime exposed (e.g. --privileged
# and the libtpu shipped in the base image); on CPU hosts everything
# falls back to the XLA:CPU backend automatically.

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential g++ curl \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app

COPY requirements.txt .
RUN pip install --no-cache-dir -r requirements.txt

COPY financial_rag_system_tpu/ financial_rag_system_tpu/
COPY bench.py evaluate.py load_testing.py frontend.py ./

# build the native libraries ahead of time so first-request latency is flat
RUN g++ -O3 -shared -fPIC \
      -o financial_rag_system_tpu/native/libfrs_tokenizer.so \
      financial_rag_system_tpu/native/tokenizer.cpp \
 && g++ -O3 -shared -fPIC \
      -o financial_rag_system_tpu/native/libfrs_hnsw.so \
      financial_rag_system_tpu/native/hnsw.cpp

ENV RAG_TPU_PORT=8001
EXPOSE 8001

HEALTHCHECK --interval=10s --timeout=5s --start-period=180s --retries=5 \
  CMD curl -sf http://localhost:8001/ready || exit 1

CMD ["python", "-m", "financial_rag_system_tpu.serving.app"]
