"""Demo entry point: homomorphic AES-128 AddRoundKey + SubBytes, end to end.

Parity target: the reference's ``main.py`` (reference: main.py:11-73) — its
smallest end-to-end demo encrypts one AES state, applies AddRoundKey and
SubBytes homomorphically, and prints decoded results with timings.  Here the
same demo runs on the TPU-native engine; every op is exact (bit-identical
decode against the NumPy AES model in aes/reference.py).

Usage:
    python main.py            # quick demo (small ring, CPU-friendly)
    python main.py --logn 15  # benchmark-scale ring (TPU recommended)
    python main.py --full     # full 10-round encrypt + decrypt round-trip

The reference pinned CKKS_PARAMS = {signature 2, max_level 17, cpu,
4 threads} (main.py:11-16); the equivalents here are explicit ring/limb
parameters (params.make_params) — depth is a static limb budget, not an
engine mode, and the device is whatever jax.devices() provides.
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np


def log(*a) -> None:
    print(*a, flush=True)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--logn", type=int, default=12, help="ring degree log2")
    ap.add_argument(
        "--levels", type=int, default=40, help="level primes (depth budget)"
    )
    ap.add_argument(
        "--full",
        action="store_true",
        help="run the full 10-round encrypt/decrypt round-trip",
    )
    ap.add_argument("--blocks", type=int, default=4, help="AES blocks shown")
    ap.add_argument(
        "--cpu",
        action="store_true",
        help="pin to CPU (the axon TPU plugin force-registers ahead of "
        "JAX_PLATFORMS; this flag is the reliable override)",
    )
    args = ap.parse_args()

    import jax

    from aes_fhe_tpu.utils.cache_dirs import configure_cpu_cache

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        # CPU persistent caching segfaults on some hosts; off by default
        # (utils/cache_dirs.py).
        configure_cpu_cache(jax.config)
    else:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/aes_fhe_tpu_jax_cache"
        )
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", 0.0
        )

    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext
    from aes_fhe_tpu.aes.state import StateEncoder
    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
    from aes_fhe_tpu.aes import reference as R
    from aes_fhe_tpu.aes.ops import rotation_steps_required

    log(f"devices: {jax.devices()}")
    t0 = time.time()
    params = make_params(logn=args.logn, n_level_primes=args.levels, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params, seed=7, rotations=tuple(rotation_steps_required(stride))
    )
    enc = StateEncoder(ctx)
    log(
        f"context+keygen: {time.time()-t0:.1f}s  "
        f"(N=2^{args.logn}, limbs={params.n_limbs}, "
        f"batch={enc.batch} AES blocks per ciphertext pair)"
    )

    pipe = AES128(ctx, policy=SnapPolicy.POLY)
    rng = np.random.default_rng(7)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    key = np.arange(16, dtype=np.uint8)
    round_keys = R.expand_aes128_key(key)
    rk = pipe.prepare_round_keys(round_keys)
    n = min(args.blocks, enc.batch)
    if n < 1:
        ap.error(f"--blocks must be >= 1 (got {args.blocks})")

    # --- AddRoundKey (reference demo step 1, main.py:25-50) ---------------
    ct = enc.encrypt(states)
    t0 = time.time()
    ct1 = pipe.ark(ct, rk[0])
    got = pipe.decode(ct1, n_blocks=n)
    dt = time.time() - t0
    want = np.stack([R.add_round_key(s, round_keys[0]) for s in states[:n]])
    log(f"AddRoundKey: {dt:.2f}s  exact={np.array_equal(got, want)}")
    log(f"  in : {states[0][:8]}...")
    log(f"  out: {got[0][:8]}...")

    # --- SubBytes (reference demo step 2, main.py:52-73) ------------------
    t0 = time.time()
    ct2 = pipe.sub(*ct1)
    got = pipe.decode(ct2, n_blocks=n)
    dt = time.time() - t0
    want = np.stack([R.sub_bytes(w) for w in want])
    log(f"SubBytes:    {dt:.2f}s  exact={np.array_equal(got, want)}")
    log(f"  out: {got[0][:8]}...")

    if not args.full:
        log("done (pass --full for the 10-round round-trip)")
        return

    # --- full round-trip (reference: test/test_aes_pipeline_roundtrip.py) -
    pipe = AES128(ctx, policy=SnapPolicy.DEBUG_RENORM)
    t0 = time.time()
    ct_enc = pipe.encrypt_states(states, round_keys)
    t_enc = time.time() - t0
    mid = pipe.decode(ct_enc, n_blocks=n)
    want_enc = np.stack([R.aes128_encrypt_state(s, round_keys) for s in states[:n]])
    log(f"encrypt 10 rounds: {t_enc:.1f}s  exact={np.array_equal(mid, want_enc)}")
    t0 = time.time()
    ct_dec = pipe.decrypt_states(ct_enc, round_keys)
    t_dec = time.time() - t0
    back = pipe.decode(ct_dec, n_blocks=n)
    ok = np.array_equal(back, states[:n])
    log(f"decrypt 10 rounds: {t_dec:.1f}s  round-trip exact={ok}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
