"""Persistent XLA compilation cache knob (utils/config.py).

Cold compiles dominate operational latency on the tunneled TPU (the IVF
k-means scan: ~14 s compile, 0.1 s execution), so every entrypoint calls
``enable_compilation_cache``.  These tests pin the knob's contract: env
kill switch, directory override, idempotence.
"""

import os

import financial_rag_system_tpu.utils.config as cfgmod
from financial_rag_system_tpu.utils.config import enable_compilation_cache


def _reset():
    cfgmod._COMPILE_CACHE_ENABLED = False


def test_env_kill_switch(monkeypatch, tmp_path):
    _reset()
    monkeypatch.setenv("RAG_TPU_COMPILE_CACHE", "0")
    monkeypatch.setenv("RAG_TPU_COMPILE_CACHE_DIR", str(tmp_path / "xla"))
    assert enable_compilation_cache() is False
    assert not os.path.exists(tmp_path / "xla")
    _reset()


def test_enables_and_is_idempotent(monkeypatch, tmp_path):
    _reset()
    import jax

    prev_dir = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    cache_dir = tmp_path / "xla"
    monkeypatch.delenv("RAG_TPU_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("RAG_TPU_COMPILE_CACHE_DIR", str(cache_dir))
    try:
        assert enable_compilation_cache() is True
        assert os.path.isdir(cache_dir)
        # the live dir is a (platform, XLA_FLAGS)-scoped SUBDIR of the
        # configured root: CPU AOT entries written under one flag set
        # can SIGILL a process running another (observed on this rig)
        live = jax.config.jax_compilation_cache_dir
        assert live.startswith(str(cache_dir) + os.sep)
        assert os.path.isdir(live)
        # second call is a no-op (does not re-point at a changed env)
        monkeypatch.setenv(
            "RAG_TPU_COMPILE_CACHE_DIR", str(tmp_path / "other")
        )
        assert enable_compilation_cache() is True
        assert jax.config.jax_compilation_cache_dir == live
    finally:
        # restore the process-global jax config for later tests
        jax.config.update("jax_compilation_cache_dir", prev_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", prev_min
        )
        _reset()
