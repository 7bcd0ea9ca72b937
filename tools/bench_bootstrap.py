"""Time ONE CKKS bootstrap at production size on the real TPU.

Feasibility probe for the full 10-round bootstrap-stabilized AES benchmark:
reports keygen time (incl. the DFT rotation keys), HBM headroom, compile
time, steady bootstrap latency, and refresh error.

Usage: python tools/bench_bootstrap.py [logn] [n_level_primes] [hamming]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n_levels = int(sys.argv[2]) if len(sys.argv) > 2 else 86
    hamming = int(sys.argv[3]) if len(sys.argv) > 3 else 192
    log(f"devices: {jax.devices()}")

    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext
    from aes_fhe_tpu.ckks.bootstrap import Bootstrapper
    from aes_fhe_tpu.aes.ops import rotation_steps_required

    t0 = time.time()
    params = make_params(logn=logn, n_level_primes=n_levels, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=tuple(rotation_steps_required(stride)),
        secret_hamming=hamming,
    )
    log(f"context+keygen: {time.time()-t0:.1f}s (L={params.n_limbs}, K={params.n_special})")

    t0 = time.time()
    bs = Bootstrapper(ctx)
    log(
        f"bootstrapper init (+{len(ctx.keys.galois)} galois keys total): "
        f"{time.time()-t0:.1f}s  (K={bs.K}, r={bs.r})"
    )

    rng = np.random.default_rng(0)
    vals = np.exp(2j * np.pi * rng.integers(0, 16, params.n_slots) / 16)
    # low-level input: what a post-round ciphertext looks like
    ct = ctx.encrypt(vals, limbs=params.n_base + 4)

    t0 = time.time()
    out = bs(ct)
    jax.device_get(out.data[..., :1, :1])
    log(f"bootstrap warmup (incl compiles): {time.time()-t0:.1f}s")

    ts = []
    for _ in range(3):
        t0 = time.time()
        out = bs(ct)
        jax.device_get(out.data[..., :1, :1])
        ts.append(time.time() - t0)
    log(f"bootstrap steady: med {np.median(ts):.2f}s  {['%.2f' % t for t in ts]}")
    log(f"output limbs: {out.n_limbs} (input {ct.n_limbs})")

    got = ctx.decrypt_values(out)
    err = float(np.max(np.abs(got - vals)))
    log(f"refresh max error: {err:.2e}")
    print(
        f'{{"metric": "ckks_bootstrap_sec", "value": {float(np.median(ts)):.3f}, '
        f'"unit": "s", "refresh_err": {err:.3e}}}'
    )


if __name__ == "__main__":
    main()
