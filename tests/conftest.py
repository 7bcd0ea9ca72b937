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

from aes_fhe_tpu.utils.cache_dirs import configure_cpu_cache

# The axon TPU plugin in this image force-registers itself ahead of the env
# var; an explicit config update is the only reliable way to pin tests to the
# virtual CPU mesh (and to local, fast XLA compiles).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent CPU compile caching is DISABLED by default: on some hosts
# XLA:CPU executable (de)serialization SIGSEGVs and killed the suite
# mid-run (utils/cache_dirs.py has the full story).  AES_FHE_CPU_CACHE=1
# opts back in on machines where it is known-good.
configure_cpu_cache(jax.config)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(7)
