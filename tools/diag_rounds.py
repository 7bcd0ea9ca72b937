"""Per-round stage differential for the bootstrap-stabilized pipeline on
the real chip: decode EVERY pipeline stage against the FIPS reference
intermediates (the reference's own _log_pair method, SURVEY.md §4) and
print the mismatch count per stage — the tool that localizes where the
10-round enc10 run loses blocks (round-4: 2/16,384 bytes off at 2 rounds,
~all blocks wrong at 10).

Usage:
    AES_FHE_DIAG_ROUNDS=10 [AES_FHE_ENTRY_LIMBS=34] python tools/diag_rounds.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
from aes_fhe_tpu.aes import reference as R


def main() -> None:
    n_rounds = int(os.environ.get("AES_FHE_DIAG_ROUNDS", "10"))
    entry = int(os.environ.get("AES_FHE_ENTRY_LIMBS", "0")) or None
    n_level = int(os.environ.get("AES_FHE_ENC10_LEVELS", "0")) or 100
    ctx, enc = bench.build(15, n_level, secret_hamming=192)
    pipe = AES128(
        ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=True, entry_limbs=entry,
        snap_count=int(os.environ.get("AES_FHE_SNAP_COUNT", "1")),
        mag_damp=os.environ.get("AES_FHE_MAG_DAMP", "0") == "1",
        merged_stab=os.environ.get("AES_FHE_MERGED_STAB", "0") == "1",
    )
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))

    debug: dict[str, np.ndarray] = {}
    slots: dict[str, tuple] = {}
    if os.environ.get("AES_FHE_DIAG_VALUES", "0") == "1":
        # record raw slot values per stage so the noise trajectory (max
        # |slot - ideal codeword|) is visible, not just byte verdicts —
        # distinguishes a noise cliff from discrete corruption
        def hook(tag, ct):
            slots[tag] = (
                ctx.decrypt_values(ct[0]).copy(),
                ctx.decrypt_values(ct[1]).copy(),
            )

        pipe.stage_hook = hook
    pipe.encrypt_states(states, rks, n_rounds=n_rounds, debug=debug)

    # reference intermediates, tagged like the pipeline's _log calls
    ref: dict[str, np.ndarray] = {}
    s = states.copy()
    ref["enc.input"] = s
    s = np.stack([R.add_round_key(x, rks[0]) for x in s])
    ref["enc.r0.ark"] = ref["enc.r0.stab"] = s
    for r in range(1, n_rounds):
        s = np.stack([R.sub_bytes(x) for x in s])
        ref[f"enc.r{r}.sub"] = ref[f"enc.r{r}.sub.stab"] = s
        s = np.stack([R.shift_rows(x) for x in s])
        ref[f"enc.r{r}.sr"] = s
        s = np.stack([R.mix_columns(x) for x in s])
        ref[f"enc.r{r}.mc"] = ref[f"enc.r{r}.mc.stab"] = s
        s = np.stack([R.add_round_key(x, rks[r]) for x in s])
        ref[f"enc.r{r}.ark"] = ref[f"enc.r{r}.stab"] = s
    s = np.stack([R.sub_bytes(x) for x in s])
    ref["enc.final.sub"] = ref["enc.final.sub.stab"] = s
    s = np.stack([R.shift_rows(x) for x in s])
    ref["enc.final.sr"] = s
    s = np.stack([R.add_round_key(x, rks[n_rounds]) for x in s])
    ref["enc.final.ark"] = ref["enc.output"] = s

    for tag, dec in debug.items():
        if tag not in ref:
            print(f"{tag:24s} (no reference)", flush=True)
            continue
        bad = dec != ref[tag]
        m = int(bad.sum())
        n_blocks_bad = int((bad.any(axis=1)).sum())
        err_s = ""
        if tag in slots:
            hi_ideal, lo_ideal = enc.pack_slots(ref[tag])
            # op outputs are phase-correct but not magnitude-normalized
            # (XOR4 outputs ride un-renormalized magnitudes by design —
            # SURVEY.md Q2); compare PHASES on the used slots
            ph = np.abs(np.concatenate([
                np.angle(slots[tag][0] / hi_ideal).ravel(),
                np.angle(slots[tag][1] / lo_ideal).ravel(),
            ]))
            mags = np.concatenate([
                np.abs(slots[tag][0]).ravel(),
                np.abs(slots[tag][1]).ravel(),
            ])
            err_s = (
                f"  |ph| med {np.median(ph):8.1e}"
                f" p99.9 {np.percentile(ph, 99.9):8.1e}"
                f" max {ph.max():8.1e}"
                f"  |z| med {np.median(mags):8.2f}"
                f" max {mags.max():8.2f}"
            )
        print(
            f"{tag:24s} bytes wrong {m:6d}/{bad.size}  "
            f"blocks tainted {n_blocks_bad:5d}/{bad.shape[0]}{err_s}",
            flush=True,
        )


if __name__ == "__main__":
    main()
