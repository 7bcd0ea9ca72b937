"""Host-fingerprinted compile-cache directories.

XLA:CPU AOT executables encode the COMPILE machine's microarchitecture;
loading them on a host with different CPU features segfaults (observed:
SIGSEGV in mont_mul when the driver moved this repo between machines with
different AVX-512 sets — the ``cpu_aot_loader`` "could lead to execution
errors such as SIGILL" warning coming true).  CPU caches therefore key on a
hash of the host's CPU flags; TPU caches are portable (the executable
targets the TPU, not the host) and stay unfingerprinted.
"""

from __future__ import annotations

import hashlib

__all__ = ["cpu_cache_dir"]


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
