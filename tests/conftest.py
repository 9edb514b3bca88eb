"""Test configuration: force CPU with 8 virtual devices for sharding tests.

The axon TPU plugin (when present) registers itself at interpreter start and
overrides ``JAX_PLATFORMS`` via ``jax.config.update``; we override it back to
CPU *after* importing jax, before any backend initializes. XLA_FLAGS must be
set before the CPU client is created, hence this happens in conftest import.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="PyTorch reference checkout not available"
)


@pytest.fixture
def rng():
    return np.random.default_rng(2025)
