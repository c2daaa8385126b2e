"""
Test configuration: run everything on a virtual 8-device CPU mesh so
multi-chip sharding logic is exercised without TPU hardware (the bench and
driver run on the real chip). Must set env vars before jax is imported.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") +
    " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import jax  # noqa: E402

# The axon site customization overrides JAX_PLATFORMS from the environment,
# so force the CPU platform through the config API as well — tests must run
# on the virtual 8-device CPU mesh, not through the remote-TPU tunnel.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the kernel graphs (especially the small-
# segment elimination loop nest) are expensive to compile on CPU; caching
# them across test processes keeps the suite fast.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture
def rng():
    return np.random.default_rng(42)
