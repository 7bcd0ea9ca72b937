"""Test harness config: force an 8-device virtual CPU mesh before jax loads.

Multi-chip logic is tested on CPU exactly as the driver validates it
(xla_force_host_platform_device_count); real-TPU paths are exercised by
bench.py only.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest

import jax

from aes_fhe_tpu.utils.cache_dirs import cpu_cache_dir

# The axon TPU plugin in this image force-registers itself ahead of the env
# var; an explicit config update is the only reliable way to pin tests to the
# virtual CPU mesh (and to local, fast XLA compiles).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persist compiled executables across test runs (compiles dominate runtime on
# this stack).  CPU caches are host-fingerprinted: stale AOT executables
# from a different machine SIGSEGV (utils/cache_dirs.py).
jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)
