"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Tests exercise multi-device sharding on a virtual CPU mesh
(xla_force_host_platform_device_count=8); benchmarks run separately on real
TPU hardware via bench.py.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The container's sitecustomize pre-imports jax and registers the 'axon'
# TPU backend, so the env var alone is ignored — force CPU via the config.
import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


REFERENCE_ROOT = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference's pure-math modules (torch+numpy only) for golden
    comparisons. Skips if the reference checkout is unavailable."""
    if not has_reference():
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REFERENCE_ROOT)
    import importlib

    diffusion = importlib.import_module("models.diffusion")
    transition = importlib.import_module("models.transition")
    return diffusion, transition


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running end-to-end tests")
