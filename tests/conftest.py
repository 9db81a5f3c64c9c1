"""Test config: force an 8-device virtual CPU platform before jax imports.

This is the JAX-native 'fake backend' for distributed testing (SURVEY.md §4):
multi-device sharding tests run on 8 virtual CPU devices without a TPU pod.
Must run before anything imports jax, hence env vars set at conftest import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
