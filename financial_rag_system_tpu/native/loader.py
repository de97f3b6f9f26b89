"""Build-on-demand ctypes loader for the native tokenizer library.

pybind11 isn't in this environment, so the binding layer is a small C
ABI + ctypes (no compile-time Python dependency at all).  The shared
library builds lazily with g++ the first time it's requested and the
result is cached beside the source; concurrent builders race benignly
through an atomic rename.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading

import numpy as np

_SRC_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_SRC_DIR, "tokenizer.cpp")
_LIB = os.path.join(_SRC_DIR, "libfrs_tokenizer.so")

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_build_failed = False


def build_shared_library(src: str, lib: str) -> bool:
    """g++ -O3 src -> lib with an atomic rename; False on any failure.

    ``-mavx2 -mfma`` first: the HNSW distance loops are the build's hot
    path and 256-bit FMA is 4.3x over scalar here.  Measured A/B on this
    rig rejected -march=native (AVX-512 codegen was ~2x SLOWER than
    AVX2, the classic wide-vector downclock) and -funroll-loops (also a
    regression).  Plain -O3 is the fallback for non-x86 toolchains.
    """
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(lib))
    os.close(fd)
    for extra in (["-mavx2", "-mfma"], []):
        try:
            subprocess.run(
                ["g++", "-O3", *extra, "-shared", "-fPIC", "-o", tmp, src],
                check=True, capture_output=True, timeout=120,
            )
            os.replace(tmp, lib)
            return True
        except (subprocess.SubprocessError, OSError):
            continue
    try:
        os.unlink(tmp)
    except OSError:
        pass
    return False


def native_enabled() -> bool:
    return os.environ.get("RAG_TPU_NATIVE", "1") not in ("0", "false")


def _build() -> bool:
    return build_shared_library(_SRC, _LIB)


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
            if not _build():
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            _build_failed = True
            return None
        lib.frs_tokenizer_create_hash.restype = ctypes.c_void_p
        lib.frs_tokenizer_create_hash.argtypes = [ctypes.c_int, ctypes.c_int]
        lib.frs_tokenizer_create_wordpiece.restype = ctypes.c_void_p
        lib.frs_tokenizer_create_wordpiece.argtypes = [ctypes.c_char_p]
        lib.frs_tokenize.restype = ctypes.c_int
        lib.frs_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        lib.frs_tokenizer_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeTokenizer:
    """ctypes wrapper; one handle per vocab configuration."""

    MAX_IDS = 8192

    def __init__(self, handle: int, lib: ctypes.CDLL):
        self._handle = handle
        self._lib = lib
        self._buf = np.empty(self.MAX_IDS, np.int32)
        self._buf_p = self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))

    def tokenize_ids(self, text: str) -> list[int]:
        raw = text.encode("ascii")
        n = self._lib.frs_tokenize(
            self._handle, raw, len(raw), self._buf_p, self.MAX_IDS
        )
        return self._buf[:n].tolist()

    def __del__(self):
        try:
            if self._lib is not None:
                self._lib.frs_tokenizer_destroy(self._handle)
        except Exception:
            pass


def load_native_tokenizer(
    *,
    vocab_size: int | None = None,
    piece_len: int = 4,
    vocab_path: str | None = None,
) -> NativeTokenizer | None:
    """Hash mode (vocab_size) or wordpiece mode (vocab_path); None if
    the native library is unavailable."""
    lib = _get_lib()
    if lib is None:
        return None
    if vocab_path is not None:
        with open(vocab_path, "rb") as f:
            handle = lib.frs_tokenizer_create_wordpiece(f.read())
    else:
        assert vocab_size is not None
        handle = lib.frs_tokenizer_create_hash(vocab_size, piece_len)
    if not handle:
        return None
    return NativeTokenizer(handle, lib)
