"""Exhaustive LUT coefficient verification (pure numpy, exact decode).

Mirrors the reference's quick_verify discipline
(gen/generate_gf_mult_2var_coeff.py:80-103) as unit tests, plus the FIPS-197
vector for the plain AES golden model."""

import numpy as np
import pytest

from aes_fhe_tpu.aes import luts, reference as R

pytestmark = pytest.mark.fast


def test_xor4_coeffs_exact():
    c = luts.xor4_coeffs()
    assert luts.verify_bivariate_16(c, lambda p, q: p ^ q)
    # structure: nonzeros only at odd (p, q) — 64 terms (reference README.md:23)
    nz = np.abs(c) > 1e-11
    assert nz.sum() == 64
    pp, qq = np.nonzero(nz)
    assert (pp % 2 == 1).all() and (qq % 2 == 1).all()


def test_gf_mult_coeffs_exact():
    for k in (1, 2, 3, 9, 11, 13, 14):
        hi, lo = luts.gf_mult_coeffs(k)
        assert luts.verify_bivariate_16(
            hi, lambda p, q, k=k: R.gf_mul((p << 4) | q, k) >> 4
        ), f"gf_mult{k} hi"
        assert luts.verify_bivariate_16(
            lo, lambda p, q, k=k: R.gf_mul((p << 4) | q, k) & 0x0F
        ), f"gf_mult{k} lo"


def test_sbox_coeffs_exact():
    for inv in (False, True):
        hi, lo = luts.sbox_coeffs(inv)
        table = R.INV_SBOX if inv else R.SBOX
        assert luts.verify_univariate_256(hi, lambda b: table[b] >> 4)
        assert luts.verify_univariate_256(lo, lambda b: table[b] & 0x0F)


def test_lift_coeffs_exact():
    c = luts.lift16_to_256_coeffs()
    z16 = np.exp(-2j * np.pi / 16) ** np.arange(16)
    vals = (z16[:, None] ** np.arange(16)[None, :]) @ c
    want = np.exp(-2j * np.pi / 256) ** np.arange(16)
    np.testing.assert_allclose(vals, want, atol=1e-9)


def test_plain_aes_fips197_vector():
    key = np.frombuffer(bytes.fromhex("000102030405060708090a0b0c0d0e0f"), np.uint8)
    pt = np.frombuffer(bytes.fromhex("00112233445566778899aabbccddeeff"), np.uint8)
    want = np.frombuffer(bytes.fromhex("69c4e0d86a7b0430d8cdb78070b4c55a"), np.uint8)
    rks = R.expand_aes128_key(key)
    ct = R.aes128_encrypt_state(pt, rks)
    np.testing.assert_array_equal(ct, want)
    back = R.aes128_decrypt_state(ct, rks)
    np.testing.assert_array_equal(back, pt)


def test_plain_aes_round_ops_consistency(rng):
    s = rng.integers(0, 256, 16, dtype=np.uint8)
    np.testing.assert_array_equal(R.inv_shift_rows(R.shift_rows(s)), s)
    np.testing.assert_array_equal(R.inv_sub_bytes(R.sub_bytes(s)), s)
    np.testing.assert_array_equal(R.inv_mix_columns(R.mix_columns(s)), s)