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
    params = make_params(logn=8, n_level_primes=40, dnum=3, scale_bits=29)
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
    # the headline of the diet: a round burns ~35 single-width limbs
    assert params.n_limbs - st[0].n_limbs <= 36
