"""Bootstrap correctness at small parameters: refresh a low-level
ciphertext, verify the message survives and the level budget is restored."""

import numpy as np
import pytest
from fractions import Fraction

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.ckks.bootstrap import Bootstrapper


@pytest.fixture(scope="module")
def bctx():
    params = make_params(logn=7, n_level_primes=44, dnum=3)
    ctx = CkksContext(params, seed=11, secret_hamming=32)
    return ctx


@pytest.fixture(scope="module")
def booter(bctx):
    return Bootstrapper(bctx, group=3)


def test_mod_raise_value(bctx, booter, rng):
    """After ModRaise the *coefficients* must read u = m~ + B*I with
    u = m~ (mod B) and |u|/B inside the EvalMod range budget K."""
    from aes_fhe_tpu.ckks.context import _decrypt_device

    vals = np.exp(2j * np.pi * rng.random(bctx.params.n_slots))
    ct = bctx.encrypt(vals)
    low = bctx.drop_limbs(ct, ct.n_limbs - bctx.params.n_base)
    raised = booter.mod_raise(low)

    l = raised.n_limbs
    res = np.asarray(
        _decrypt_device(
            raised.data, bctx.keys.secret_mont[:l], bctx._tab(l), True
        )
    )
    u = bctx.encoder.crt_centered(res, bctx.params.moduli[:l])
    B = booter._b
    m_ref = bctx.encoder.values_to_coeffs(vals, ct.scale)
    u_mod = np.array(
        [int(x) % B for x in u], dtype=object
    )
    u_mod = np.where(u_mod > B // 2, u_mod - B, u_mod)
    # centered residue mod B equals the message poly up to encryption noise
    err = np.abs((u_mod - m_ref.astype(object)).astype(np.float64))
    assert err.max() < 1e6  # << B ~ 2^91: pure encryption/conversion noise
    # range budget
    i_max = max(abs(int(x)) for x in u) / B
    assert i_max < booter.K / 2 - 2, i_max


def test_bootstrap_refreshes(bctx, booter, rng):
    vals = np.exp(2j * np.pi * rng.random(bctx.params.n_slots))
    ct = bctx.encrypt(vals)
    low = bctx.drop_limbs(ct, ct.n_limbs - bctx.params.n_base)
    fresh = booter(low)
    assert fresh.n_limbs > bctx.params.n_base + 6, "no level headroom gained"
    got = bctx.decrypt_values(fresh)
    np.testing.assert_allclose(got, vals, atol=3e-4)
    # refreshed ciphertext must support further multiplication
    sq = bctx.multiply(fresh, fresh, drop=2)
    np.testing.assert_allclose(bctx.decrypt_values(sq), vals * vals, atol=2e-3)