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

So ``configure_cpu_cache`` supports three modes — off (tests), read-only
(the multichip dryrun: hits a pre-populated cache, never serializes, so
neither failure can trigger on an unknown host), and write (population
runs, opt-in via AES_FHE_CPU_CACHE=1).  TPU caches are unaffected (the
executable targets the TPU, not the host) and stay enabled and
unfingerprinted.
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


def cpu_cache_dir(base: str | None = None) -> str:
    """Host-fingerprinted CPU compile-cache dir, INSIDE the repo working
    tree (like .jax_cache/.keycache) so driver rounds inherit a cache the
    builder session populated on the same host class."""
    if base is None:
        base = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))),
            ".jax_cache_cpu",
        )
    return f"{base}_{_cpu_sig()}"


def configure_cpu_cache(jax_config, mode: str | None = None) -> None:
    """Apply the CPU persistent-cache policy to ``jax.config``.

    Modes (default from AES_FHE_CPU_CACHE: "1"/"write", "read", else "off"):

    - ``off``   — no persistent cache (test suites: safest; crash surface
      zero, each program recompiles).
    - ``read``  — cache dir enabled but ``min_compile_time_secs`` is set
      astronomically high, so NO executable is ever serialized (the
      round-3 serialize-side SIGSEGV cannot trigger) while previously
      written entries are still READ.  Loads are safe on the host class
      that wrote them (the fingerprint in the dir name guarantees that: a
      different CPU gets a different, empty dir and simply recompiles).
      This is the multichip-dryrun mode: the builder session pre-populates
      the cache in ``write`` mode, observing any crash itself; driver runs
      then hit it read-only.
    - ``write`` — full read/write caching (population runs; opt-in).
    """
    if mode is None:
        env = os.environ.get("AES_FHE_CPU_CACHE", "0")
        mode = {"1": "write", "write": "write", "read": "read"}.get(env, "off")
    if mode == "off":
        jax_config.update("jax_compilation_cache_dir", None)
        return
    jax_config.update("jax_compilation_cache_dir", cpu_cache_dir())
    jax_config.update(
        "jax_persistent_cache_min_compile_time_secs",
        0.0 if mode == "write" else 1e18,
    )
    jax_config.update("jax_persistent_cache_min_entry_size_bytes", 0)
