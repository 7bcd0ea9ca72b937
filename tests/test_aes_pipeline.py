"""Full AES-128 pipeline tests: encrypt/decrypt vs the FIPS-exact golden
model, stage snapshots, and the true round trip (reference:
test/test_aes_pipeline_roundtrip.py — with decryption actually correct,
fixing quirk Q1)."""

import numpy as np
import pytest

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.aes import reference as R
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
from aes_fhe_tpu.aes.ops import rotation_steps_required


@pytest.fixture(scope="module")
def pipe():
    params = make_params(logn=8, n_level_primes=30, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=tuple(rotation_steps_required(stride)),
        conjugation=True,
    )
    return AES128(ctx, policy=SnapPolicy.DEBUG_RENORM)


@pytest.fixture(scope="module")
def key_and_rks(rng):
    key = np.arange(16, dtype=np.uint8)
    return key, R.expand_aes128_key(key)


def test_two_rounds_vs_reference(pipe, key_and_rks, rng):
    """2-round differential check, every stage snapshot compared."""
    _, rks = key_and_rks
    states = rng.integers(0, 256, (pipe.encoder.batch, 16), dtype=np.uint8)
    debug = {}
    ct = pipe.encrypt_states(states, rks, n_rounds=2, debug=debug)
    got = pipe.decode(ct)

    # plain model, same reduced-round structure
    want = np.stack([R.add_round_key(s, rks[0]) for s in states])
    np.testing.assert_array_equal(debug["enc.r0.ark"], want)
    want = np.stack(
        [
            R.add_round_key(
                R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[1]
            )
            for s in want
        ]
    )
    np.testing.assert_array_equal(debug["enc.r1.ark"], want)
    want = np.stack(
        [R.add_round_key(R.shift_rows(R.sub_bytes(s)), rks[2]) for s in want]
    )
    np.testing.assert_array_equal(got, want)


def test_full_roundtrip(pipe, key_and_rks, rng):
    """10-round homomorphic encrypt -> homomorphic decrypt -> original
    plaintext, and the encryption output equals FIPS AES-128."""
    _, rks = key_and_rks
    states = rng.integers(0, 256, (pipe.encoder.batch, 16), dtype=np.uint8)
    ct = pipe.encrypt_states(states, rks)
    enc_bytes = pipe.decode(ct)
    want = np.stack([R.aes128_encrypt_state(s, rks) for s in states])
    np.testing.assert_array_equal(enc_bytes, want)

    back = pipe.decrypt_states(ct, rks)
    np.testing.assert_array_equal(pipe.decode(back), states)