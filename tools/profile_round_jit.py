"""Per-op steady-state timing of the JITTED homomorphic AES round on TPU.

Runs the ops in real round order (so each op sees its true input level) and
times each op steadily by re-running it on its own input.  Forces a tiny
device_get per timing to defeat the axon tunnel's early-return on
block_until_ready.

Usage: python tools/profile_round_jit.py [logn] [n_level_primes]
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


def sync(state):
    if isinstance(state, tuple):
        jax.device_get(state[0].data[..., :1, :1, :1])
    else:
        jax.device_get(state.data[..., :1, :1, :1])


def timed(label, fn, arg, reps=3):
    out = fn(arg)
    sync(out)  # warm (compiles)
    ts = []
    for _ in range(reps):
        t0 = time.time()
        out = fn(arg)
        sync(out)
        ts.append(time.time() - t0)
    log(f"  {label:<22s} med {np.median(ts):7.2f}s  {['%.2f' % t for t in ts]}")
    return out


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n_levels = int(sys.argv[2]) if len(sys.argv) > 2 else 68
    log(f"devices: {jax.devices()}")

    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext
    from aes_fhe_tpu.aes.state import StateEncoder
    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
    from aes_fhe_tpu.aes import reference as R

    t0 = time.time()
    params = make_params(logn=logn, n_level_primes=n_levels, dnum=3)
    stride = params.n_slots // 16
    from aes_fhe_tpu.aes.ops import rotation_steps_required

    ctx = CkksContext(params, seed=7, rotations=tuple(rotation_steps_required(stride)))
    enc = StateEncoder(ctx)
    log(f"context+keygen: {time.time()-t0:.1f}s (L={params.n_limbs})")

    pipe = AES128(ctx, policy=SnapPolicy.NONE, use_jit=True)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))
    rk = pipe.prepare_round_keys(rks)

    ct = enc.encrypt(states)
    log(f"input limbs: {ct[0].n_limbs}")

    st = timed("sub_bytes", lambda s: pipe.sub(*s), ct)
    log(f"    limbs after sub: {st[0].n_limbs}")
    st = timed("shift_rows", pipe.shift, st)
    log(f"    limbs after shift: {st[0].n_limbs}")
    st = timed("mix_columns", pipe.mix, st)
    log(f"    limbs after mix: {st[0].n_limbs}")
    st = timed("add_round_key", lambda s: pipe.ark(s, rk[1]), st)
    log(f"    limbs after ark: {st[0].n_limbs}")

    got = pipe.decode(st, n_blocks=2)
    want = np.stack(
        [
            R.add_round_key(R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[1])
            for s in states[:2]
        ]
    )
    log(f"correct: {bool(np.array_equal(got, want))}")


if __name__ == "__main__":
    main()
