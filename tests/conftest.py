"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip sharding tests run on a simulated 8-device CPU mesh — the
standard JAX substitute for real hardware (SURVEY.md §4). Must run before
jax initialises its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin overrides JAX_PLATFORMS; the config flag wins.
jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is dominated by XLA compiles of the
# full model / train step (~600 s cold). Warm runs finish far under the
# 10-minute budget; the cache key is the HLO hash, so code changes
# recompile exactly what they touch.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_cache_dir))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
