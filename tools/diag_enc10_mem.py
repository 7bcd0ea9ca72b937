"""HBM autopsy for the enc10 OOM (round 4): walk the first AES round +
bootstrap phase by phase on the real chip, hard-syncing and printing
device memory_stats after each, to find where the 16 GB go.

Usage:  python tools/diag_enc10_mem.py [logn] [n_level]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

t0 = time.time()


def mem(tag: str, sync_arr=None) -> None:
    if sync_arr is not None:
        jax.device_get(sync_arr[..., :1, :1])
    # memory_stats() is empty through the axon tunnel; client-side live
    # array accounting still tells resident bytes (not XLA workspace).
    live = sum(a.nbytes for a in jax.live_arrays())
    print(
        f"[{time.time()-t0:7.1f}s] {tag}: live_arrays="
        f"{live/2**30:.2f}GiB",
        flush=True,
    )


def main() -> None:
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n_level = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    import bench

    ctx, enc = bench.build(logn, n_level, secret_hamming=192)
    mem("context+keys installed")

    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
    from aes_fhe_tpu.aes import reference as R
    from aes_fhe_tpu.ckks.types import stack_cts, unstack_cts

    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))

    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=True,
                  stab_sync=True)
    mem("pipeline built (bootstrap DFT keys added)")

    rk = pipe.prepare_round_keys(rks)
    mem("round keys encrypted", rk[0][0].data)

    ct = enc.encrypt(states)
    mem("states encrypted", ct[0].data)

    ct = pipe.ark(ct, rk[0])
    mem("r0 ark", ct[0].data)

    boot = pipe.bootstrapper
    st = stack_cts(ctx.align(*ct))
    x = ctx.to_scale(st, boot.boot_scale)
    mem("to boot scale", x.data)
    raised = boot.mod_raise(x)
    mem("mod_raise", raised.data)
    z = ctx.to_scale(boot.c2s(raised), boot.work_scale)
    mem("c2s", z.data)
    zc = ctx.conjugate(z)
    from fractions import Fraction

    s_half = Fraction(1 << 29)
    t0_ = ctx.rescale(ctx.mul_scalar(ctx.add(z, zc), 0.5, s_half), 1)
    t1_ = ctx.rescale(ctx.mul_scalar(ctx.sub(zc, z), -0.5j, s_half), 1)
    mem("conj split", t1_.data)
    halves = []
    for t in (t0_, t1_):
        fp = boot._ef_poly(t)
        mem("eval_frac_poly half", fp.data)
        fi = boot._ef_iter(fp)
        mem("eval_frac_iter half", fi.data)
        halves.append(fi)
    f01 = stack_cts(ctx.align(*halves))
    f0, f1 = unstack_cts(f01)
    l = min(f0.n_limbs, f1.n_limbs)
    f0 = ctx.drop_limbs(f0, f0.n_limbs - l)
    f1 = ctx.drop_limbs(f1, f1.n_limbs - l)
    target = f0.scale * Fraction(1 << 29)
    a = ctx.mul_scalar(f0, 1.0, target / f0.scale)
    b = ctx.mul_scalar(f1, -1j, target / f1.scale)
    z2 = ctx.rescale(ctx.add(a, b), 1)
    out = boot.s2c(z2)
    mem("s2c", out.data)
    from aes_fhe_tpu.ckks.types import Ciphertext

    new_scale = out.scale * x.scale / Fraction(boot._q0)
    out = Ciphertext(data=out.data, scale=new_scale, ntt=True)
    out = ctx.to_scale(out, Fraction(ctx.params.scale))
    out2 = pipe.snap.pair(tuple(unstack_cts(out)))
    mem("snap", out2[0].data)
    print("bootstrap phases completed; output limbs:", out2[0].n_limbs)

    # Fidelity: the refreshed pair must decode to the SAME bytes as the
    # pre-refresh state (r0 ark output = states ^ rk0).
    want = states[:8] ^ np.asarray(rks[0], np.uint8)[None, :]
    got_pre = pipe.decode(ct, n_blocks=8)
    got_post = pipe.decode(out2, n_blocks=8)
    pre_m = int((got_pre != want).sum())
    post_m = int((got_post != want).sum())
    print(f"pre-refresh decode mismatches:  {pre_m}/{want.size}")
    print(f"post-refresh decode mismatches: {post_m}/{want.size}")
    # raw slot magnitudes/phases of the refreshed hi ciphertext
    vals = ctx.decrypt_values(out2[0])[:8]
    print("refreshed hi slots [:8]:", np.round(vals, 4).tolist())


if __name__ == "__main__":
    main()
