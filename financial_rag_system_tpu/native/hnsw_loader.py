"""ctypes binding for the native HNSW graph builder (hnsw.cpp).

Same build-on-demand pattern as the tokenizer loader: the shared library
compiles lazily with g++ and is cached beside the source.  Returns the
two arrays the device walk consumes — level-0 adjacency and entry nodes
— or None when native code is unavailable (callers fall back to the
exact-kNN Python builder in index/hnsw.py).
"""

from __future__ import annotations

import ctypes
import os
import threading

import numpy as np

from financial_rag_system_tpu.native.loader import (
    build_shared_library,
    native_enabled,
)

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_SRC_DIR, "hnsw.cpp")
_LIB = os.path.join(_SRC_DIR, "libfrs_hnsw.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def _get_lib() -> ctypes.CDLL | None:
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    if not native_enabled():
        _build_failed = True
        return None
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        if not os.path.exists(_LIB) or os.path.getmtime(_LIB) < os.path.getmtime(
            _SRC
        ):
            if not build_shared_library(_SRC, _LIB):
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        f32p = ctypes.POINTER(ctypes.c_float)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.frs_hnsw_build.restype = ctypes.c_void_p
        lib.frs_hnsw_build.argtypes = [
            f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_uint, ctypes.c_int,
        ]
        lib.frs_hnsw_max_level.restype = ctypes.c_int
        lib.frs_hnsw_max_level.argtypes = [ctypes.c_void_p]
        lib.frs_hnsw_adjacency0.restype = ctypes.c_int
        lib.frs_hnsw_adjacency0.argtypes = [ctypes.c_void_p, i32p]
        lib.frs_hnsw_entries.restype = ctypes.c_int
        lib.frs_hnsw_entries.argtypes = [ctypes.c_void_p, i32p, ctypes.c_int]
        lib.frs_hnsw_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def build_hnsw_graph(
    vecs: np.ndarray,
    *,
    m: int = 16,
    ef_construction: int = 100,
    seed: int = 0,
    entries_cap: int = 64,
    n_threads: int = 0,
) -> tuple[np.ndarray, np.ndarray] | None:
    """Native HNSW build. vecs (N, D) float32 L2-normalized.

    n_threads=0 uses all hardware threads (striped-lock concurrent
    insertion).  Returns (adjacency0 (N, 2M) int32 with -1 padding,
    entries (E,) int32) or None when the native library is unavailable.
    """
    lib = _get_lib()
    if lib is None:
        return None
    v = np.ascontiguousarray(vecs, np.float32)
    n, d = v.shape
    handle = lib.frs_hnsw_build(
        v.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        n, d, m, ef_construction, seed, n_threads,
    )
    if not handle:
        return None
    try:
        adj = np.empty((n, 2 * m), np.int32)
        lib.frs_hnsw_adjacency0(
            handle, adj.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
        )
        ent = np.empty(entries_cap, np.int32)
        cnt = lib.frs_hnsw_entries(
            handle, ent.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            entries_cap,
        )
        return adj, ent[:cnt].copy()
    finally:
        lib.frs_hnsw_destroy(handle)
