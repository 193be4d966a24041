"""Test configuration: force an 8-device virtual CPU platform.

The reference has no tests (SURVEY.md §4); this suite is designed from
scratch.  Multi-chip sharding tests run on a fake 8-device CPU mesh — the
standard JAX substitute for distributed test hardware.

Must run before anything imports jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("RLMG_ATTN_BACKEND", "xla")

import jax  # noqa: E402

# NOTE: the JAX_PLATFORMS env var is ignored by this environment's JAX build
# (an experimental 'axon' TPU platform registers regardless); the config
# update below is the reliable way to pin tests to the virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: repeat suite runs skip most XLA compiles.
# min_compile_time 0 (not the 1.0s bench default): profiled on the 1-vCPU
# test host, the suite's dominant cost is thousands of ~0.3s op-by-op
# eager compiles (e.g. init_params = ~50 eager RNG ops = ~15s) that a
# 1.0s threshold never caches.  Measured: 258s warm vs 467s populate run.
_cache_dir = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
