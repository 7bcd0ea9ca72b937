"""Repeat ONE identical refresh on ONE identical input N times in a single
process, decoding after each — the discriminating experiment for the
round-4 finding that the 10-round pipeline is exact for ~6 refreshes and
then a single refresh corrupts every block at once.

If the same program on the same input is right for the first k iterations
and wrong afterwards, the math is exact and the environment (the TPU
tunnel, which is known to leak HBM across program executions) is silently
corrupting results once the leak fills the chip.

Usage: AES_FHE_LEAK_ITERS=12 python tools/diag_leak.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
from aes_fhe_tpu.aes import reference as R
from aes_fhe_tpu.ckks.types import stack_cts, unstack_cts


def main() -> None:
    iters = int(os.environ.get("AES_FHE_LEAK_ITERS", "12"))
    ctx, enc = bench.build(15, 96, secret_hamming=192)
    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=True)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))
    rk = pipe.prepare_round_keys(rks)

    ct = enc.encrypt(states)
    ct = pipe.ark(ct, rk[0])
    want = states ^ np.asarray(rks[0], np.uint8)[None, :]
    st0 = stack_cts(ctx.align(*ct))

    # Round-4 result: 12 bare refreshes on the same input were ALL exact —
    # yet the full pipeline corrupts at its 7th refresh.  The difference is
    # the big op programs (SubBytes 128-basis, MixColumns) running between
    # refreshes; AES_FHE_LEAK_OP=sub interleaves a SubBytes execution per
    # iteration to reproduce the pipeline's memory churn while keeping the
    # refresh input identical every time.
    op = os.environ.get("AES_FHE_LEAK_OP", "")
    pair = None
    for i in range(iters):
        t0 = time.time()
        if op == "sub" and pair is not None:
            # churn with the pipeline's own r.sub program signature
            # (input = refreshed pair at the post-refresh level); result
            # discarded — only the memory/load pattern matters
            spair = pipe.sub(*pair)
            import jax

            jax.device_get(spair[0].data[..., :1, :1])
        out = pipe.bootstrapper(st0)       # SAME input every iteration
        pair = pipe.snap.pair(tuple(unstack_cts(out)))
        got = pipe.decode(pair)
        m = int((got != want).sum())
        print(
            f"refresh #{i+1}: mismatches {m:6d}/{want.size}  "
            f"({time.time()-t0:.1f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
