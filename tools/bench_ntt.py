"""Micro-bench: Pallas fused NTT vs XLA NTT on the real TPU.

Usage: python tools/bench_ntt.py [logn] [n_limbs]
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp

_CACHE = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from aes_fhe_tpu.params import find_ntt_primes
from aes_fhe_tpu.core.ntt import build_ntt_tables, ntt, intt
from aes_fhe_tpu.core.ntt_pallas import build_pallas_tables, ntt_pl, intt_pl

def log(*a): print(*a, file=sys.stderr, flush=True)

def timeit(fn, x, n=20):
    o = fn(x); jax.block_until_ready(o)
    t0 = time.time()
    for _ in range(n):
        o = fn(x)
    jax.block_until_ready(o)
    return (time.time() - t0) / n

def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    L = int(sys.argv[2]) if len(sys.argv) > 2 else 71
    log(f"devices: {jax.devices()}")
    primes = tuple(find_ntt_primes(L, 29.0, 2 << logn))
    t = build_ntt_tables(primes, logn)
    pt = build_pallas_tables(t, lanes=min(128, (1 << logn) // 16))
    rng = np.random.default_rng(0)
    x = jnp.asarray(np.stack([rng.integers(0, q, 1 << logn, dtype=np.uint64).astype(np.uint32) for q in primes]))

    f_x = jax.jit(lambda v: ntt(v, t))
    f_p = jax.jit(lambda v: ntt_pl(v, pt))
    b_x = jax.jit(lambda v: intt(v, t))
    b_p = jax.jit(lambda v: intt_pl(v, pt))

    # correctness on-chip
    y_x, y_p = f_x(x), f_p(x)
    assert np.array_equal(np.asarray(y_x), np.asarray(y_p)), "fwd mismatch on TPU!"
    z_x, z_p = b_x(y_x), b_p(y_x)
    assert np.array_equal(np.asarray(z_x), np.asarray(z_p)), "inv mismatch on TPU!"
    assert np.array_equal(np.asarray(z_x), np.asarray(x))
    log("bit-exact on device: OK")

    for name, fn, v in [("ntt_xla", f_x, x), ("ntt_pallas", f_p, x),
                        ("intt_xla", b_x, y_x), ("intt_pallas", b_p, y_x)]:
        dt = timeit(fn, v)
        log(f"{name:<12s} [L={L}, N=2^{logn}] {dt*1e3:8.3f} ms")

if __name__ == "__main__":
    main()
