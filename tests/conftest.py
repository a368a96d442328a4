"""Test configuration: run on a virtual 8-device CPU mesh.

The driver benches on the real TPU; tests run everywhere. Set platform env
BEFORE jax import (mirrors the reference's RAYCORE_TEST_BACKEND matrix,
test/runtests.jl:31-45 — our 'cpu' lane; the TPU lane is exercised by
bench.py / __graft_entry__.py on hardware).
"""
import os

# Separate compile cache for the CPU test lane (the shared cache also holds
# TPU/axon entries compiled with different host-feature flags).
os.environ["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_cache_cpu_tests"

# Fresh per-session capacity-hint store: hints persist across processes by
# design (ops/capacity_store.py), but tests assert cold-routing states.
import tempfile  # noqa: E402
os.environ["RAYCORE_CAPACITY_DIR"] = tempfile.mkdtemp(
    prefix="raycore_caphints_")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The sandbox's sitecustomize force-registers the axon TPU platform and sets
# jax_platforms="axon,cpu"; override AFTER import so tests run on the 8-device
# virtual CPU mesh regardless.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    # Two tiers (VERDICT r2 item 10): `pytest -m "not slow"` is the fast
    # CI-style lane (~5 min measured on an idle 8-core box); the full
    # suite is the merge gate.
    config.addinivalue_line(
        "markers", "slow: heavyweight test (full-suite tier only; "
        "deselect with -m 'not slow')")


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
