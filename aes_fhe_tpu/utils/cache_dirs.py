"""CPU compile-cache policy: OFF by default, fingerprinted when opted in.

Two distinct XLA:CPU persistent-cache failures were observed on this
round's hosts:

1. Loading an AOT executable compiled on a machine with a different CPU
   feature set SIGSEGVs (the ``cpu_aot_loader`` "could lead to execution
   errors such as SIGILL" warning coming true) — hence the host
   fingerprint in ``cpu_cache_dir``.
2. On at least one host, *serializing* certain freshly-compiled CPU
   executables for the cache SIGSEGVs outright
   (``compilation_cache.put_executable_and_time``), killing the test
   suite mid-run even with a clean fingerprinted directory.

So ``configure_cpu_cache`` leaves the persistent cache DISABLED for CPU
runs unless AES_FHE_CPU_CACHE=1 opts in; recompiling each run is slower
but never segfaults.  TPU caches are unaffected (the executable targets
the TPU, not the host) and stay enabled and unfingerprinted.
"""

from __future__ import annotations

import hashlib
import os

__all__ = ["cpu_cache_dir", "configure_cpu_cache"]


def _cpu_sig() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha256(
                        " ".join(sorted(line.split()[2:])).encode()
                    ).hexdigest()[:10]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:10]


def cpu_cache_dir(base: str = "/tmp/aes_fhe_tpu_jax_cache") -> str:
    return f"{base}_{_cpu_sig()}"


def configure_cpu_cache(jax_config) -> None:
    """Apply the CPU persistent-cache policy to ``jax.config``: disabled
    unless AES_FHE_CPU_CACHE=1 (then host-fingerprinted)."""
    if os.environ.get("AES_FHE_CPU_CACHE", "0") == "1":
        jax_config.update("jax_compilation_cache_dir", cpu_cache_dir())
        jax_config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    else:
        jax_config.update("jax_compilation_cache_dir", None)
