"""Static limb-budget probe for the enc10/dec10 bench chain.

Traces the bootstrap-stabilized AES pipeline ABSTRACTLY via
``jax.eval_shape`` — zero FLOPs, no TPU — and prints the limb count at
every stage boundary.  The limb/scale schedule of the pipeline is fully
static (Fraction scales + RNS row counts evolve at trace time), so any
"not enough limbs" failure a 25-minute TPU run would hit at warmup
reproduces here in ~a minute on CPU (round-4 session 3: the 98-prime
EvalMod-range-fix chain crashed enc10's round-1 SubBytes trace 25 min in;
this probe reproduces and localizes it instantly).

The probe drives the REAL ``AES128.encrypt_states`` (via its
``stage_hook``), not a hand-copied stage list, so it can never desync
from the pipeline it predicts.

Usage: JAX_PLATFORMS=cpu python tools/probe_limbs.py [levels=100] [rounds=2]
       AES_FHE_MERGED_STAB=1 probes the two-stabilize schedule.

Measured landings at logn=15 (round-5): 98 -> 27 limbs (crash in round-1
SubBytes — the committed round-4 default was trace-broken), 100 -> 34
(the budgeted landing; 3-stab bench default), 102 -> 38 (merged
two-stab schedule: sr+mc+ark = 37 fits under one refresh).
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
    n_level = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    logn = int(os.environ.get("AES_FHE_PROBE_LOGN", "15"))
    merged = os.environ.get("AES_FHE_MERGED_STAB", "0") == "1"
    ctx, enc = bench.build(logn, n_level, secret_hamming=192, scale_bits=58)
    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=False,
                  stab_sync=False, merged_stab=merged,
                  snap_count=int(os.environ.get("AES_FHE_SNAP_COUNT", "1")),
                  mag_damp=os.environ.get("AES_FHE_MAG_DAMP", "0") == "1")
    last_hooked = {}

    def hook(tag, ct):
        # scale/ntt are concrete (host-side Fraction ledger) even under
        # abstract tracing — remember them so the resumed trace can start
        # from the landing's exact signature
        last_hooked["scale"], last_hooked["ntt"] = ct[0].scale, ct[0].ntt
        print(f"  {tag:20s} l={ct[0].n_limbs}", flush=True)

    pipe.stage_hook = hook
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))

    states = np.zeros((1, 16), np.uint8)
    ct0 = enc.encrypt(np.tile(states, (enc.batch, 1)))
    s_fresh, ntt_fresh = ct0[0].scale, ct0[0].ntt

    def flow(ah, al):
        s, ntt = last_hooked["scale"], last_hooked["ntt"]
        ct = (Ciphertext(data=ah, scale=s, ntt=ntt),
              Ciphertext(data=al, scale=s, ntt=ntt))
        # resume right after round 0's stabilize; rounds 1..n_rounds-1 plus
        # the final round run through the pipeline's own sequencing.
        out = pipe.encrypt_states(
            None, rks, n_rounds=n_rounds, resume_ct=ct, start_round=1
        )
        return out[0].data, out[1].data

    # the resume point is the refresh landing: probe it by tracing one
    # stabilize of the fresh ciphertext
    def landing(ah, al):
        ct = (Ciphertext(data=ah, scale=s_fresh, ntt=ntt_fresh),
              Ciphertext(data=al, scale=s_fresh, ntt=ntt_fresh))
        out = pipe._stabilize(pipe.ark(ct, pipe.prepare_round_keys(rks)[0]),
                              None, "r0.stab")
        return out[0].data, out[1].data

    sds = [jax.ShapeDtypeStruct(c.data.shape, c.data.dtype) for c in ct0]
    print(f"probe: logn={logn} levels={n_level} rounds={n_rounds} "
          f"merged_stab={merged} (abstract trace, BOOTSTRAP policy)")
    print(" round 0 (fresh -> ark -> stabilize):")
    landed = jax.eval_shape(landing, *sds)
    land_limbs = landed[0].shape[-2]
    print(f"  refresh landing: l={land_limbs}")
    print(f" rounds 1..{n_rounds - 1} + final (resumed at the landing):")
    sds_land = [
        jax.ShapeDtypeStruct(s.shape, s.dtype) for s in landed
    ]
    jax.eval_shape(flow, *sds_land)
    print("probe: OK — limb budget covers the traced rounds")


if __name__ == "__main__":
    main()
