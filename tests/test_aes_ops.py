"""Per-op plaintext-differential tests for the homomorphic AES layer.

The reference ran exactly this pattern in per-module __main__ harnesses
(SURVEY.md section 4): encrypt a seeded random state, apply the homomorphic
op, decode, compare *exactly* against the plain NumPy model."""

import numpy as np
import pytest

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.aes import reference as R
from aes_fhe_tpu.aes.state import StateEncoder
from aes_fhe_tpu.aes.ops import (
    Xor4,
    SubBytes,
    ShiftRows,
    MixColumns,
    InvMixColumns,
    Snap,
    SnapNoMul,
    NoiseReducer,
    Snap1D,
    rotation_steps_required,
)


@pytest.fixture(scope="module")
def actx():
    params = make_params(logn=8, n_level_primes=30, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=tuple(rotation_steps_required(stride)),
        conjugation=True,
    )
    return ctx


@pytest.fixture(scope="module")
def enc(actx):
    return StateEncoder(actx)


def _states(rng, enc):
    return rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)


def test_xor4_addroundkey(actx, enc, rng):
    xor4 = Xor4(actx)
    a = _states(rng, enc)
    b = _states(rng, enc)
    ca, cb = enc.encrypt(a), enc.encrypt(b)
    out_hi = xor4(ca[0], cb[0])
    out_lo = xor4(ca[1], cb[1])
    got = enc.decrypt(out_hi, out_lo, n_blocks=enc.batch)
    np.testing.assert_array_equal(got, a ^ b)


def test_shift_rows_and_inverse(actx, enc, rng):
    sr = ShiftRows(actx, enc.stride, inverse=False)
    isr = ShiftRows(actx, enc.stride, inverse=True)
    s = _states(rng, enc)
    ct = enc.encrypt(s)
    got = enc.decrypt(*sr(ct), n_blocks=enc.batch)
    want = np.stack([R.shift_rows(row) for row in s])
    np.testing.assert_array_equal(got, want)
    # Inv o Shift == Id (reference: inv_shiftrows.py:104-106)
    got2 = enc.decrypt(*isr(sr(ct)), n_blocks=enc.batch)
    np.testing.assert_array_equal(got2, s)


def test_sub_bytes(actx, enc, rng):
    sb = SubBytes(actx, inverse=False)
    s = _states(rng, enc)
    ct = enc.encrypt(s)
    got = enc.decrypt(*sb(*ct), n_blocks=enc.batch)
    np.testing.assert_array_equal(got, R.SBOX[s])


def test_inv_sub_bytes(actx, enc, rng):
    isb = SubBytes(actx, inverse=True)
    s = _states(rng, enc)
    ct = enc.encrypt(s)
    got = enc.decrypt(*isb(*ct), n_blocks=enc.batch)
    np.testing.assert_array_equal(got, R.INV_SBOX[s])


def test_mix_columns(actx, enc, rng):
    xor4 = Xor4(actx)
    mc = MixColumns(actx, xor4, enc.stride)
    s = _states(rng, enc)
    ct = enc.encrypt(s)
    got = enc.decrypt(*mc(ct), n_blocks=enc.batch)
    want = np.stack([R.mix_columns(row) for row in s])
    np.testing.assert_array_equal(got, want)


def test_inv_mix_columns(actx, enc, rng):
    xor4 = Xor4(actx)
    imc = InvMixColumns(actx, xor4, enc.stride)
    s = _states(rng, enc)
    ct = enc.encrypt(s)
    got = enc.decrypt(*imc(ct), n_blocks=enc.batch)
    want = np.stack([R.inv_mix_columns(row) for row in s])
    np.testing.assert_array_equal(got, want)


def test_snap_preserves_codewords(actx, enc, rng):
    snap = Snap(actx)
    s = _states(rng, enc)
    ct = enc.encrypt(s)
    out = snap.pair(ct)
    got = enc.decrypt(*out, n_blocks=enc.batch)
    np.testing.assert_array_equal(got, s)
    # snap should leave codewords essentially on the unit circle
    vals = actx.decrypt_values(out[0])
    np.testing.assert_allclose(np.abs(vals), 1.0, atol=1e-4)


@pytest.mark.parametrize(
    "factory,on_circle",
    [
        (SnapNoMul, False),           # magnitude 1.25 on even codewords
        (lambda ctx: NoiseReducer(ctx, m=16), True),
        (Snap1D, False),              # c1 = sinc(pi/16) ~ 0.9936
    ],
    ids=["nomul", "noise_reducer16", "snap1d"],
)
def test_snap_family_phase_exact(actx, enc, rng, factory, on_circle):
    """Every snap variant (reference C12-C14 family) is phase-exact on the
    zeta16 codebook, so the phase-only decode stays exact."""
    snap = factory(actx)
    s = _states(rng, enc)
    ct = enc.encrypt(s)
    out = snap.pair(ct)
    got = enc.decrypt(*out, n_blocks=enc.batch)
    np.testing.assert_array_equal(got, s)
    if on_circle:
        vals = actx.decrypt_values(out[0])
        np.testing.assert_allclose(np.abs(vals), 1.0, atol=1e-4)


def test_snap_contracts_phase_noise():
    """Plain-math properties of the snap maps on perturbed codewords:
    Snap contracts quadratically everywhere; the reference's NoMul formula
    contracts on odd codewords but amplifies on even ones (the documented
    reason it is not the default)."""
    eps = 1e-2
    v = np.arange(16)
    x = np.exp(-2j * np.pi * v / 16) * np.exp(1j * eps)
    want = np.exp(-2j * np.pi * v / 16)
    phase_err = lambda f: np.abs(np.angle(f / want))
    f_snap = (17 * x - x**17) / 16
    assert phase_err(f_snap).max() < 20 * eps**2
    f_nomul = (9 * x + x**9) / 8
    assert phase_err(f_nomul)[1::2].max() < 0.2 * eps   # odd: contracts
    assert phase_err(f_nomul)[0::2].min() > 1.5 * eps   # even: amplifies

def test_mag_damp_bounded_and_codeword_preserving(actx, rng):
    """MagDamp (the round-5 explosion guard): |g(x)| <= ~1 for every
    |x| <= 4, codeword magnitudes preserved to O(delta^2), phases
    untouched — verified homomorphically against the plain cubic model."""
    from aes_fhe_tpu.aes.ops import MagDamp

    n = actx.params.n_slots
    mags = rng.uniform(0.2, 3.9, n)
    phs = rng.uniform(0, 2 * np.pi, n)
    vals = mags * np.exp(1j * phs)
    ct = actx.encrypt(vals)
    d = MagDamp(actx)
    got = actx.decrypt_values(d.one(ct))
    m = mags**2
    c2, c3 = MagDamp.C2, MagDamp.C3
    p = 1 - (m - 1) / 2 + c2 * (m - 1) ** 2 + c3 * (m - 1) ** 3
    np.testing.assert_allclose(got, vals * p, atol=1e-3)
    assert np.max(np.abs(got)) < 1.01  # bounded: inside the snap basin
    # codewords with 1% magnitude noise come back to ~1 (quadratic)
    cw = np.exp(-2j * np.pi * rng.integers(0, 16, n) / 16) * 1.01
    g2 = actx.decrypt_values(d.one(actx.encrypt(cw)))
    np.testing.assert_allclose(np.abs(g2), 1.0, atol=5e-4)
    np.testing.assert_allclose(np.angle(g2 / cw), 0.0, atol=1e-4)


def test_snap_iteration_contracts_worst_tail():
    """Plain-math pin of the round-5 fortified-stabilize design: the worst
    measured stabilize-input tail (theta ~ 3.4e-2) leaves |z| ~ 1.009
    after ONE snap (which the ^128 S-box ladder amplifies to ~3.5 and the
    next snap then detonates), while THREE snaps land phase ~ 5e-6 and
    magnitude 1 +- 1e-5 — below the ^128 ladder's danger threshold."""
    snap = lambda x: (17 * x - x**17) / 16
    x1 = snap(np.exp(1j * 0.034))
    assert abs(abs(x1) - 1) > 5e-3          # single snap leaves the residue
    assert abs(x1) ** 128 > 2.0             # which the ladder amplifies
    assert abs(snap(snap(abs(x1) ** 128))) > 1e3  # and the snap detonates
    x3 = snap(snap(x1))
    assert abs(np.angle(x3)) < 1e-5
    assert abs(abs(x3) - 1) < 1e-5
    assert abs(abs(x3) ** 128 - 1) < 2e-3   # ladder-safe
