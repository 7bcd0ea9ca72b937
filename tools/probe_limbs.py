"""Static limb-budget probe for the enc10/dec10 bench chain.

Traces the bootstrap-stabilized AES round flow ABSTRACTLY via
``jax.eval_shape`` — zero FLOPs, no TPU — and prints the limb count at
every stage boundary.  The limb/scale schedule of the pipeline is fully
static (Fraction scales + RNS row counts evolve at trace time), so any
"not enough limbs" failure a 25-minute TPU run would hit at warmup
reproduces here in ~a minute on CPU (round-4 session 3: the 98-prime
EvalMod-range-fix chain crashed enc10's round-1 SubBytes trace 25 min in;
this probe reproduces and localizes it instantly).

Usage: JAX_PLATFORMS=cpu python tools/probe_limbs.py [levels=98] [rounds=2]
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("AES_FHE_KEY_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

import bench
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
from aes_fhe_tpu.aes import reference as R
from aes_fhe_tpu.ckks.types import Ciphertext


def main() -> None:
    n_level = int(sys.argv[1]) if len(sys.argv) > 1 else 98
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    logn = int(os.environ.get("AES_FHE_PROBE_LOGN", "15"))
    ctx, enc = bench.build(logn, n_level, secret_hamming=192, scale_bits=58)
    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=False,
                  stab_sync=False)
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))
    rk = pipe.prepare_round_keys(rks)

    states = np.zeros((1, 16), np.uint8)
    ct0 = enc.encrypt(np.tile(states, (enc.batch, 1)))
    s_fresh, ntt_fresh = ct0[0].scale, ct0[0].ntt

    def say(tag, ct):
        print(f"  {tag:20s} l={ct[0].n_limbs}", flush=True)
        return ct

    def flow(ah, al):
        ct = (Ciphertext(data=ah, scale=s_fresh, ntt=ntt_fresh),
              Ciphertext(data=al, scale=s_fresh, ntt=ntt_fresh))
        say("fresh", ct)
        ct = say("r0.ark", pipe.ark(ct, rk[0]))
        ct = say("r0.stab", pipe._stabilize(ct, None, "r0.stab"))
        for r in range(1, n_rounds):
            ct = say(f"r{r}.sub", pipe.sub(*ct))
            ct = say(f"r{r}.sub.stab", pipe._stabilize(ct, None, "s"))
            ct = say(f"r{r}.sr", pipe.shift(ct))
            ct = say(f"r{r}.mc", pipe.mix(ct))
            ct = say(f"r{r}.mc.stab", pipe._stabilize(ct, None, "m"))
            ct = say(f"r{r}.ark", pipe.ark(ct, rk[r]))
            ct = say(f"r{r}.stab", pipe._stabilize(ct, None, "a"))
        return ct[0].data, ct[1].data

    sds = [jax.ShapeDtypeStruct(c.data.shape, c.data.dtype) for c in ct0]
    print(f"probe: logn={logn} levels={n_level} rounds={n_rounds} "
          f"(abstract trace, BOOTSTRAP policy)")
    jax.eval_shape(flow, *sds)
    print("probe: OK — limb budget covers the traced rounds")


if __name__ == "__main__":
    main()
