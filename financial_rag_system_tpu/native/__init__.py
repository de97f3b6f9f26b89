"""Native (C++) components and their ctypes loaders.

Build products are cached next to the sources; set ``RAG_TPU_NATIVE=0``
to force the pure-Python fallbacks.
"""

from financial_rag_system_tpu.native.loader import load_native_tokenizer
