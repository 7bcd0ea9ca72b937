"""Experimental-variant tests: byte-domain MixColumns matches the plain
NumPy MixColumns and the production nibble-domain op (reference C23 parity,
temp/mix_columns_enc.py)."""

import numpy as np
import pytest

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.aes import reference as R
from aes_fhe_tpu.aes import luts
from aes_fhe_tpu.aes.state import StateEncoder
from aes_fhe_tpu.aes.ops import Xor4, rotation_steps_required
from aes_fhe_tpu.aes.experimental import MixColumnsByteDomain
from aes_fhe_tpu.aes.zeta import ZetaCodec


def test_byte_split_luts_exact():
    """Offline: the composed gf-mult-and-split LUTs decode exactly on all
    256 byte codewords (quick_verify discipline, reference C20)."""
    for k in (1, 2, 3):
        hi, lo = luts.gf_mult_byte_split_coeffs(k)
        assert luts.verify_univariate_256(
            hi, lambda b, k=k: R.gf_mul(b, k) >> 4
        )
        assert luts.verify_univariate_256(
            lo, lambda b, k=k: R.gf_mul(b, k) & 0x0F
        )
    s_hi, s_lo = luts.split256_coeffs()
    # structural claims from the docstring
    assert np.count_nonzero(s_hi) == 16
    assert np.count_nonzero(s_lo) == 1 and abs(s_lo[16] - 1) < 1e-9


def test_gf_mult_byte_coeffs_exact():
    z256 = np.exp(-2j * np.pi / 256)
    for k in (2, 3):
        c = luts.gf_mult_byte_coeffs(k)
        powers = z256 ** np.arange(256)
        vals = (powers[:, None] ** np.arange(256)[None, :]) @ c
        want = z256 ** np.array([R.gf_mul(b, k) for b in range(256)])
        np.testing.assert_allclose(vals, want, atol=1e-9)


@pytest.fixture(scope="module")
def ectx():
    # the byte-domain chain (lift + recombine + deg-255 basis + 3 XOR4
    # levels) consumes ~55 levels
    params = make_params(logn=8, n_level_primes=60, dnum=3)
    stride = params.n_slots // 16
    return CkksContext(
        params, seed=7, rotations=tuple(rotation_steps_required(stride))
    )


def test_mix_columns_byte_domain(ectx, rng):
    enc = StateEncoder(ectx)
    mc = MixColumnsByteDomain(ectx, Xor4(ectx), enc.stride)
    s = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    out = mc(enc.encrypt(s))
    got = enc.decrypt(*out, n_blocks=enc.batch)
    want = np.stack([R.mix_columns(x) for x in s])
    np.testing.assert_array_equal(got, want)
