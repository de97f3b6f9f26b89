"""Hermetic test setup.

Mirrors the reference's TESTING-shim philosophy (reference tests.py:8-9:
set env *before importing the app*): here the env flags force an
8-virtual-device CPU backend so mesh sharding and collectives run for
real without TPUs, and TESTING swaps heavy compute for deterministic
stand-ins while the control plane stays live.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # the session env pins a TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["TESTING"] = "True"
os.environ.setdefault("DATABASE_URL", ":memory:")

# pytest's own startup imports jax before this file runs, so the env vars
# above are too late for jax's config module — override post-import too.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
