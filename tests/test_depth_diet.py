"""Depth-diet (Δ=2^29 single-prime-rescale) chain: a full AES round must be
bit-exact and consume ~35 limbs (vs 63 on the Δ=2^58 chain) — the round-2
perf lever behind bench.py's default configuration."""

import numpy as np
import pytest

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.aes import reference as R
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
from aes_fhe_tpu.aes.ops import rotation_steps_required

pytestmark = pytest.mark.slow


def test_full_round_bit_exact_29bit(rng):
    params = make_params(logn=8, n_level_primes=52, dnum=3, scale_bits=29)
    assert params.rescale_drop == 1
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=tuple(rotation_steps_required(stride)),
        conjugation=True,
    )
    pipe = AES128(ctx, policy=SnapPolicy.NONE)
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))
    rk = pipe.prepare_round_keys(rks)
    states = rng.integers(0, 256, (pipe.encoder.batch, 16), dtype=np.uint8)
    ct = pipe.encoder.encrypt(states)
    st = pipe.sub(*ct)
    st = pipe.shift(st)
    st = pipe.mix(st)
    st = pipe.ark(st, rk[1])
    got = pipe.decode(st)
    want = np.stack(
        [
            R.add_round_key(
                R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[1]
            )
            for s in states
        ]
    )
    np.testing.assert_array_equal(got, want)
    # the diet after the round-3 precision fix: ~48 single-width limbs per
    # round (vs 63 on the Δ=2^58 chain).  The pure 35-limb schedule decoded
    # wrong at N=2^15 on the chip (ladder noise, DESIGN.md §15): SubBytes'
    # byte ladder and the snap's x^16 chain now run at the elevated Δ² tier
    # (ctx.ladder), buying back exactness for ~13 limbs.
    assert params.n_limbs - st[0].n_limbs <= 49


def test_two_rounds_bootstrap_policy_29bit(rng):
    """BOOTSTRAP-policy pipeline bit-exact ON THE DEPTH-DIET CHAIN — the
    round-2 open question (DESIGN §13): at the chain scale Δ=2^29 the
    bootstrap interior quantized every rescale at 2^-29 relative and the
    refresh error landed at 2.5e-2 (all-wrong decode after the degree-255
    S-box).  The Bootstrapper now runs its interior at Δ²=2^58 (two primes
    per rescale), measured 2.7e-6 after snap, and the 2-round pipeline must
    decode bit-exactly with no secret key in the hot path."""
    params = make_params(logn=8, n_level_primes=96, dnum=3, scale_bits=29)  # +4 for the round-4 EvalMod range fix
    assert params.rescale_drop == 1
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=tuple(rotation_steps_required(stride)),
        secret_hamming=64,
    )
    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP)
    assert pipe.bootstrapper.mul_drop == 2  # double-scale interior active
    states = rng.integers(0, 256, (pipe.encoder.batch, 16), dtype=np.uint8)
    key = np.arange(16, dtype=np.uint8)
    rks = R.expand_aes128_key(key)

    ct = pipe.encrypt_states(states, rks, n_rounds=2)
    got = pipe.decode(ct)
    want = np.stack([R.add_round_key(s, rks[0]) for s in states])
    want = np.stack(
        [
            R.add_round_key(
                R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[1]
            )
            for s in want
        ]
    )
    want = np.stack(
        [R.add_round_key(R.shift_rows(R.sub_bytes(s)), rks[2]) for s in want]
    )
    np.testing.assert_array_equal(got, want)
