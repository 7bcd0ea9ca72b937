"""Numerical-forensics property checks.

The reference embedded these probes in temp/mixcolumns_desilo_port.py
(xor(a,a) == 0 at :394-401, operand-order symmetry :246-253, rotation-pair
xor :241-244) to chase its rotate->XOR drift bug (README.md:126).  With
unit-normalized coefficients and exact scale targeting they must all hold
exactly here — kept as regression guards."""

import numpy as np
import pytest

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.aes.state import StateEncoder
from aes_fhe_tpu.aes.ops import Xor4, rotation_steps_required


@pytest.fixture(scope="module")
def fctx():
    params = make_params(logn=8, n_level_primes=24, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params, seed=9, rotations=tuple(rotation_steps_required(stride))
    )
    return ctx


def test_xor_self_is_zero(fctx, rng):
    """xor(a, a) == 0 — the probe that failed in the reference
    (decoded near 255 there, temp/mixcolumns_desilo_port.py:396-399)."""
    enc = StateEncoder(fctx)
    xor4 = Xor4(fctx)
    s = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(s)
    out = enc.decrypt(xor4(ct[0], ct[0]), xor4(ct[1], ct[1]), n_blocks=enc.batch)
    np.testing.assert_array_equal(out, np.zeros_like(s))


def test_xor_operand_symmetry(fctx, rng):
    enc = StateEncoder(fctx)
    xor4 = Xor4(fctx)
    a = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    b = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ca, cb = enc.encrypt(a), enc.encrypt(b)
    fwd = enc.decrypt(xor4(ca[0], cb[0]), xor4(ca[1], cb[1]), n_blocks=enc.batch)
    rev = enc.decrypt(xor4(cb[0], ca[0]), xor4(cb[1], ca[1]), n_blocks=enc.batch)
    np.testing.assert_array_equal(fwd, rev)
    np.testing.assert_array_equal(fwd, a ^ b)


def test_rotation_then_xor(fctx, rng):
    """XOR after slot rotation must stay exact (the reference's core drift
    scenario: rotate -> XOR broke off-codebook there)."""
    enc = StateEncoder(fctx)
    xor4 = Xor4(fctx)
    s = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(s)
    d = -4 * enc.stride
    r_hi, r_lo = fctx.rotate(ct[0], d), fctx.rotate(ct[1], d)
    out = enc.decrypt(
        xor4(ct[0], r_hi), xor4(ct[1], r_lo), n_blocks=enc.batch
    )
    # slot-space rotation by -4*stride maps slot p <- p+4 (cyclic over 16)
    perm_slot = np.roll(np.arange(16), -4)
    slot_of_byte = enc.slot_of_byte
    byte_of_slot = np.argsort(slot_of_byte)
    rotated_bytes = np.empty_like(s)
    for b in range(s.shape[0]):
        slot_vals = s[b][byte_of_slot[np.arange(16)]]  # values by slot index
        rot_vals = slot_vals[perm_slot]
        rotated_bytes[b] = rot_vals[slot_of_byte]
    np.testing.assert_array_equal(out, s ^ rotated_bytes)