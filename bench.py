"""Benchmark: homomorphic AES ops on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

Round-1 headline: AddRoundKey (one homomorphic state XOR round-key = two
4-bit XOR bivariate LUT evaluations over a packed ciphertext pair) — the
reference's benchmark config 1, published at 1.63 s on its CPU engine
(reference: main.py:144-146, BASELINE.md).  ``vs_baseline`` is the speedup
factor (reference_seconds / ours; > 1 means faster than the reference).

The packed batch carries n_slots/16 AES blocks per ciphertext pair
(2048 at N=2^16, exactly the reference's packing — main.py:121-136).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/aes_fhe_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> None:
    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext
    from aes_fhe_tpu.aes.state import StateEncoder
    from aes_fhe_tpu.aes.ops import Xor4, rotation_steps_required
    from __graft_entry__ import _ark_step_fn

    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    log(f"devices: {jax.devices()}")

    t0 = time.time()
    params = make_params(logn=logn, n_level_primes=14, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=(),
        conjugation=True,
    )
    enc = StateEncoder(ctx)
    log(f"context+keygen: {time.time()-t0:.1f}s  "
        f"(N=2^{logn}, L={params.n_limbs}, K={params.n_special}, "
        f"batch={enc.batch} AES blocks/ct-pair)")

    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    keys = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    t0 = time.time()
    ct = enc.encrypt(states)
    kt = enc.encrypt(keys)
    log(f"encrypt inputs: {time.time()-t0:.1f}s")

    # The remote TPU compiler in this environment is resource-capped and
    # kills whole-step programs (~35k ops) even with keys threaded as
    # arguments via ctx.jit_fn.  The compound kernels (key switch, rescale)
    # are jitted per limb count with keys as args; glue dispatches eagerly.
    step = _ark_step_fn(ctx, ct[0])
    args = (ct[0].data, ct[1].data, kt[0].data, kt[1].data)

    t0 = time.time()
    out = step(*args)
    jax.block_until_ready(out)
    log(f"warmup (compiles): {time.time()-t0:.1f}s")

    times = []
    for _ in range(5):
        t0 = time.time()
        out = step(*args)
        jax.block_until_ready(out)
        times.append(time.time() - t0)
    t_med = float(np.median(times))
    log(f"times: {['%.3f' % t for t in times]}")

    # correctness check (host decode of the first few blocks)
    from aes_fhe_tpu.ckks.types import Ciphertext

    hi = Ciphertext(data=out[0], scale=ct[0].scale, ntt=True)
    lo = Ciphertext(data=out[1], scale=ct[0].scale, ntt=True)
    got = enc.decrypt(hi, lo, n_blocks=4)
    want = states[:4] ^ keys[:4]
    ok = bool(np.array_equal(got, want))
    log(f"correctness (4 blocks): {ok}")

    baseline = 1.63  # reference AddRoundKey seconds (main.py:144-146)
    print(
        json.dumps(
            {
                "metric": "aes128_addroundkey_sec",
                "value": t_med,
                "unit": "s",
                "vs_baseline": baseline / t_med,
                "correct": ok,
                "blocks_per_ct": enc.batch,
            }
        )
    )


if __name__ == "__main__":
    main()
