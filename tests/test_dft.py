"""Homomorphic-DFT stage derivation: numpy-level validation against the
encoder, then homomorphic application on the engine."""

import numpy as np
import pytest
from fractions import Fraction

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.ckks.encoder import Encoder
from aes_fhe_tpu.ckks.dft import (
    leaf_map,
    s2c_stage_ops,
    c2s_stage_ops,
    merge_stage_ops,
    apply_stage_np,
    stage_offsets,
    HomDft,
)


def _encoder_matrix_apply(params, coeffs):
    """vals = E . coeffs via the production encoder (float path)."""
    enc = Encoder(params)
    return enc.coeffs_to_values(np.asarray(coeffs, np.float64))


@pytest.mark.parametrize("logn", [3, 5, 7])
def test_s2c_stages_match_encoder(logn, rng):
    params = make_params(logn=logn, n_level_primes=4, dnum=2)
    big_n = params.n
    c = rng.standard_normal(big_n)
    a_idx, b_idx = leaf_map(big_n)
    z = c[a_idx] - 1j * c[b_idx]
    for op in s2c_stage_ops(big_n):
        z = apply_stage_np(z, op)
    want = _encoder_matrix_apply(params, c)
    np.testing.assert_allclose(z, want, atol=1e-9)


@pytest.mark.parametrize("group", [1, 3])
def test_c2s_inverts_s2c(group, rng):
    big_n = 1 << 6
    n = big_n // 2
    c = rng.standard_normal(big_n)
    a_idx, b_idx = leaf_map(big_n)
    z0 = c[a_idx] - 1j * c[b_idx]
    fwd = merge_stage_ops(s2c_stage_ops(big_n), group)
    inv = merge_stage_ops(c2s_stage_ops(big_n), group)
    z = z0.copy()
    for op in fwd:
        z = apply_stage_np(z, op)
    for op in inv:
        z = apply_stage_np(z, op)
    np.testing.assert_allclose(z, z0, atol=1e-9)


def test_homomorphic_s2c_c2s_roundtrip(rng):
    """Encrypt slot values, run C2S homomorphically -> slots hold packed
    coefficients; run S2C -> original values."""
    params = make_params(logn=7, n_level_primes=16, dnum=3)
    big_n, n = params.n, params.n_slots
    group = 3
    fwd = merge_stage_ops(s2c_stage_ops(big_n), group)
    inv = merge_stage_ops(c2s_stage_ops(big_n), group)
    rots = stage_offsets(fwd, n) | stage_offsets(inv, n)
    ctx = CkksContext(
        params, seed=3, rotations=tuple(rots), conjugation=True
    )
    vals = np.exp(2j * np.pi * rng.random(n))
    ct = ctx.encrypt(vals)

    c2s = HomDft(ctx, inv)
    s2c = HomDft(ctx, fwd)
    mid = c2s(ct)

    # the packed-coefficient slots should match the true (unrounded,
    # unit-scale) embedding coefficients of the value vector
    enc = ctx.encoder
    full = np.zeros(big_n, np.complex128)
    full[enc._pos] = vals
    full[enc._cpos] = np.conj(vals)
    coeffs = (np.fft.ifft(full) * enc._omega_mk).real
    a_idx, b_idx = leaf_map(big_n)
    want_mid = coeffs[a_idx] - 1j * coeffs[b_idx]
    got_mid = ctx.decrypt_values(mid)
    np.testing.assert_allclose(got_mid, want_mid, atol=1e-3)

    back = s2c(mid)
    got = ctx.decrypt_values(back)
    np.testing.assert_allclose(got, vals, atol=1e-4)