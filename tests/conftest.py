"""Test config: force an 8-device virtual CPU platform before jax is used.

This is the JAX-native 'fake backend' for distributed testing (SURVEY.md §4):
multi-device sharding tests run on 8 virtual CPU devices without a TPU pod.

NOTE: this environment's sitecustomize registers the `axon` TPU PJRT plugin
at interpreter startup and force-sets jax.config jax_platforms='axon,cpu',
so env vars alone (JAX_PLATFORMS=cpu) are NOT enough — jax is already
imported and configured by the time conftest runs.  We must override via
jax.config.update *after* import, before any backend is initialized.
Without this, the whole suite silently runs over the TPU tunnel (~100x
slower per test and flaky on tiny shapes).
"""

import os

# XLA_FLAGS is read lazily when the CPU client is first created, so setting
# it here (before any jax computation) still takes effect.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compile cache: the suite compiles the full model dozens of
# times on a 1-core host; repeat runs hit the cache and finish in minutes.
_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache_cpu")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
