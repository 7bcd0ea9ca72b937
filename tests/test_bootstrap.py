"""Bootstrap correctness at small parameters: refresh a low-level
ciphertext, verify the message survives and the level budget is restored,
then one homomorphic AES AddRoundKey stabilized by the bootstrap policy."""

import numpy as np
import pytest
from fractions import Fraction

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.ckks.bootstrap import Bootstrapper


@pytest.fixture(scope="module")
def bctx():
    # 48 level primes: the round-4 EvalMod range fix (K sized by the
    # max-over-2N extreme-value quantile, bootstrap.py) costs one extra
    # squaring, so the interior consumes ~4 more limbs than the old chain
    # budgeted for.
    params = make_params(logn=7, n_level_primes=48, dnum=3)
    return CkksContext(params, seed=11, secret_hamming=32)


@pytest.fixture(scope="module")
def booter(bctx):
    return Bootstrapper(bctx, group=3)


def test_mod_raise_value(bctx, booter, rng):
    """After ModRaise the coefficients read u = m~ + q0*I with the centered
    residue mod q0 small (the message at the bootstrap scale) and |u|/q0
    inside the EvalMod range budget K/2."""
    from aes_fhe_tpu.ckks.context import _decrypt_device

    vals = np.exp(2j * np.pi * rng.random(bctx.params.n_slots))
    ct = bctx.encrypt(vals)
    low = bctx.to_scale(ct, booter.boot_scale)
    raised = booter.mod_raise(low)

    l = raised.n_limbs
    res = np.asarray(
        _decrypt_device(
            raised.data, bctx.keys.secret_mont[:l], bctx._tab(l), True
        )
    )
    u = bctx.encoder.crt_centered(res, bctx.params.moduli[:l])
    q0 = booter._q0
    # mod_raise boosts the raw data by an exact integer (noise-floor fix)
    boost = max(1, round(bctx.params.scale / q0))
    assert all(int(x) % boost == 0 for x in u[:8])
    u = np.array([int(x) // boost for x in u], dtype=object)
    u_mod = np.array([int(x) % q0 for x in u], dtype=object)
    u_mod = np.where(u_mod > q0 // 2, u_mod - q0, u_mod)
    # centered residue mod q0 = message at ~2^20 scale + noise: small vs q0
    assert np.abs(u_mod.astype(np.float64)).max() < 2**25
    # range budget for EvalMod
    i_max = max(abs(int(x)) for x in u) / q0
    assert i_max < booter.K / 2 - 1, i_max


def test_bootstrap_refreshes(bctx, booter, rng):
    vals = np.exp(2j * np.pi * rng.random(bctx.params.n_slots))
    ct = bctx.encrypt(vals)
    low = bctx.drop_limbs(ct, ct.n_limbs - 6)
    fresh = booter(low)
    assert fresh.n_limbs >= bctx.params.n_base + 2, fresh.n_limbs
    got = bctx.decrypt_values(fresh)
    np.testing.assert_allclose(got, vals, atol=2e-4)
    # refreshed ciphertext must support further multiplication
    sq = bctx.multiply(fresh, fresh, drop=2)
    np.testing.assert_allclose(bctx.decrypt_values(sq), vals * vals, atol=1e-3)

@pytest.mark.fast
def test_evalmod_range_plan():
    """Pin the EvalMod range policy (round-4 corruption-cliff root cause:
    an N-independent 4.5-sigma bound that one of ~2N x 30-refresh lift
    coefficients exceeded per 10-round run at N=2^15, bootstrap.py
    ``range_plan`` docstring).  Guards both failure modes: under-coverage
    (K/2 < extreme-value bound) and silent widening (K growth changes the
    double-angle count r, which consumes 2 more limbs per refresh and
    breaks the bench chain's landing-limb budget — bench.py enc10
    builds 98 primes for exactly r=10)."""
    import math

    from aes_fhe_tpu.ckks.bootstrap import Bootstrapper

    for logn in (7, 8, 15, 16):
        n = 1 << logn
        for h in (32, 64, 192, (2 * n) // 3):
            K, r = Bootstrapper.range_plan(n, h)
            z = math.sqrt(2.0 * math.log(2.0 * n)) + 1.5
            bound = z * math.sqrt(h / 12.0) + 3.0
            # coverage: the symmetric range must contain the max lift
            assert K / 2 >= bound, (logn, h, K, bound)
            # the Taylor input range promise EvalMod compiles against
            assert 2 * math.pi * (K / 2 + 1) / 2**r <= 0.35 + 1e-9

    # The bench configuration, pinned: a drift in either value silently
    # shifts the refresh landing level at N=2^15 — fail HERE, not at
    # trace time inside a 40-minute TPU run.
    assert Bootstrapper.range_plan(1 << 15, 192) == (64, 10)
    assert Bootstrapper.range_plan(1 << 16, 192) == (64, 10)
