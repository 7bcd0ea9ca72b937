"""CKKS engine property tests at small (insecure) parameters.

Mirrors the reference's test philosophy (plaintext-differential checks against
exact references, SURVEY.md section 4) at the engine level: every homomorphic
verb is validated against complex arithmetic on the decoded slots.
"""

import numpy as np
import pytest
import jax

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext


@pytest.fixture(scope="module")
def ctx():
    params = make_params(logn=8, n_level_primes=8, dnum=3)
    return CkksContext(params, seed=123, rotations=(1, -1, 4), conjugation=True)


def _rand_vals(rng, n, mag=1.0):
    return mag * np.exp(2j * np.pi * rng.random(n))


def test_encrypt_decrypt_roundtrip(ctx, rng):
    v = _rand_vals(rng, ctx.params.n_slots)
    ct = ctx.encrypt(v)
    out = ctx.decrypt_values(ct)
    np.testing.assert_allclose(out, v, atol=1e-9)


def test_add_sub(ctx, rng):
    a = _rand_vals(rng, ctx.params.n_slots)
    b = _rand_vals(rng, ctx.params.n_slots)
    ca, cb = ctx.encrypt(a), ctx.encrypt(b)
    np.testing.assert_allclose(ctx.decrypt_values(ctx.add(ca, cb)), a + b, atol=1e-8)
    np.testing.assert_allclose(ctx.decrypt_values(ctx.sub(ca, cb)), a - b, atol=1e-8)


def test_add_const_mul_scalar(ctx, rng):
    from fractions import Fraction

    a = _rand_vals(rng, ctx.params.n_slots)
    ca = ctx.encrypt(a)
    np.testing.assert_allclose(
        ctx.decrypt_values(ctx.add_const(ca, 0.5 - 0.25j)), a + (0.5 - 0.25j), atol=1e-8
    )
    sc = Fraction(1 << 29)
    prod = ctx.mul_scalar(ca, 0.7 + 0.2j, sc)
    np.testing.assert_allclose(
        ctx.decrypt_values(prod), a * (0.7 + 0.2j), atol=1e-6
    )


def test_multiply(ctx, rng):
    a = _rand_vals(rng, ctx.params.n_slots)
    b = _rand_vals(rng, ctx.params.n_slots)
    ca, cb = ctx.encrypt(a), ctx.encrypt(b)
    prod = ctx.multiply(ca, cb, drop=2)
    out = ctx.decrypt_values(prod)
    np.testing.assert_allclose(out, a * b, atol=1e-6)
    # and a second multiply at the lower level
    prod2 = ctx.multiply(prod, ctx.drop_limbs(ca, ca.n_limbs - prod.n_limbs), drop=2)
    np.testing.assert_allclose(ctx.decrypt_values(prod2), a * a * b, atol=1e-5)


def test_rotate(ctx, rng):
    v = _rand_vals(rng, ctx.params.n_slots)
    ct = ctx.encrypt(v)
    for delta in (1, -1, 4):
        out = ctx.decrypt_values(ctx.rotate(ct, delta))
        np.testing.assert_allclose(out, np.roll(v, delta), atol=1e-7,
                                   err_msg=f"delta={delta}")


def test_conjugate(ctx, rng):
    v = _rand_vals(rng, ctx.params.n_slots)
    ct = ctx.encrypt(v)
    out = ctx.decrypt_values(ctx.conjugate(ct))
    np.testing.assert_allclose(out, np.conj(v), atol=1e-7)


def test_mul_plain_mask(ctx, rng):
    from fractions import Fraction

    v = _rand_vals(rng, ctx.params.n_slots)
    mask = (rng.random(ctx.params.n_slots) > 0.5).astype(np.complex128)
    ct = ctx.encrypt(v)
    pt = ctx.encode_plain(mask, Fraction(1 << 29), ct.n_limbs)
    out = ctx.decrypt_values(ctx.rescale(ctx.mul_plain(ct, pt), 1))
    np.testing.assert_allclose(out, v * mask, atol=1e-6)


def test_encode_const_matches_general(ctx):
    """The 2-coefficient closed form for slot constants must agree with the
    general canonical-embedding encoder."""
    from fractions import Fraction

    c = 0.37 - 0.81j
    scale = Fraction(1 << 40)
    enc = ctx.encoder
    coeffs = enc.values_to_coeffs(
        np.full(ctx.params.n_slots, c, np.complex128), scale
    )
    dense = np.asarray(coeffs, np.float64)
    a = int(round(c.real * float(scale)))
    b = int(round(-c.imag * float(scale)))
    sparse = np.zeros(ctx.params.n, np.float64)
    sparse[0] = a
    sparse[ctx.params.n // 2] = b
    np.testing.assert_allclose(dense, sparse, atol=2.0)