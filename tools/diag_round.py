"""Diagnostic: per-op steady-state timing of one homomorphic AES round with
HONEST synchronization (jax.device_get of a tiny slice — block_until_ready
returns early through the axon tunnel and under-reports, see
.claude/skills/verify/SKILL.md)."""

import sys
import time

import numpy as np
import jax

sys.path.insert(0, ".")
import bench  # noqa: E402  (sets the compile cache dir)
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy  # noqa: E402
from aes_fhe_tpu.aes import reference as R  # noqa: E402


def sync(ct):
    # fetch 1 value per poly: forces completion of everything queued
    if isinstance(ct, tuple):
        for c in ct:
            jax.device_get(c.data[..., 0, 0, :1])
    else:
        jax.device_get(ct.data[..., 0, 0, :1])


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    ctx, enc = bench.build(logn, 68)
    ctx.materialize_key_a()
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    key = np.arange(16, dtype=np.uint8)
    rks = R.expand_aes128_key(key)
    pipe = AES128(ctx, policy=SnapPolicy.NONE, use_jit=True)
    rk = pipe.prepare_round_keys(rks)
    ct0 = enc.encrypt(states)

    def one_round(ct, timed=False):
        out = {}
        t0 = time.time()
        ct = pipe.sub(*ct)
        if timed:
            sync(ct); out["sub"] = time.time() - t0; t0 = time.time()
        ct = pipe.shift(ct)
        if timed:
            sync(ct); out["shift"] = time.time() - t0; t0 = time.time()
        ct = pipe.mix(ct)
        if timed:
            sync(ct); out["mix"] = time.time() - t0; t0 = time.time()
        ct = pipe.ark(ct, rk[1])
        if timed:
            sync(ct); out["ark"] = time.time() - t0
        return ct, out

    t0 = time.time()
    out, _ = one_round(ct0)
    sync(out)
    print(f"warmup round: {time.time()-t0:.1f}s", flush=True)

    for i in range(2):
        t0 = time.time()
        out, parts = one_round(ct0, timed=True)
        total = time.time() - t0
        print(f"round {i}: {total:.2f}s  parts={ {k: round(v,2) for k,v in parts.items()} }", flush=True)

    # untimed whole-round (no per-op syncs): the real pipelined number
    for i in range(2):
        t0 = time.time()
        out, _ = one_round(ct0)
        sync(out)
        print(f"pipelined round {i}: {time.time()-t0:.2f}s", flush=True)

    got = pipe.decode(out, n_blocks=4)
    want = np.stack(
        [R.add_round_key(R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[1])
         for s in states[:4]]
    )
    print("correct:", bool(np.array_equal(got, want)))


if __name__ == "__main__":
    main()
