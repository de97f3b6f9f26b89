"""Hermetic test setup.

Mirrors the reference's TESTING-shim philosophy (reference tests.py:8-9:
set env *before importing the app*): here the env flags force an
8-virtual-device CPU backend so mesh sharding and collectives run for
real without TPUs, and TESTING swaps heavy compute for deterministic
stand-ins while the control plane stays live.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["TESTING"] = "True"
os.environ.setdefault("DATABASE_URL", ":memory:")

import pytest  # noqa: E402


@pytest.fixture()
def rng():
    import numpy as np

    return np.random.default_rng(0)
