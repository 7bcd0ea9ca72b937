"""Golden tests for RNS base conversion, including the MXU digit-matmul path.

The reference hid base conversion inside the closed desilofhe engine
(SURVEY.md section 2.2); here it is a first-class kernel and must be exact:
FastBaseConv returns x + alpha*B (alpha < m) on every target prime, and the
matmul formulation must agree with the direct multiply-accumulate loop
BIT-EXACTLY (same residue class, both fully reduced).
"""

import math

import numpy as np
import pytest

from aes_fhe_tpu.params import find_ntt_primes
from aes_fhe_tpu.core import rns
from aes_fhe_tpu.core.rns import (
    make_conv_tables,
    base_convert,
    base_convert_centered,
)

pytestmark = pytest.mark.fast


def _random_residues(rng, src, n, big_vals):
    """Residues of the given big integers: [m, n] u32."""
    return np.stack(
        [(big_vals % q).astype(np.uint64).astype(np.uint32) for q in src]
    )


@pytest.mark.parametrize("m", [1, 4, 6, 24])
def test_base_convert_exact_overshoot(rng, m):
    two_n = 512
    src = tuple(find_ntt_primes(m, 29.0, two_n))
    tgt = tuple(find_ntt_primes(8, 30.0, two_n, exclude=frozenset(src)))
    t = make_conv_tables(src, tgt)
    B = math.prod(src)
    n = 256
    vals = np.array(
        [int(rng.integers(0, min(B, 1 << 62))) for _ in range(n)], object
    ) % B
    x = _random_residues(rng, src, n, vals)
    out = np.asarray(base_convert(x, t))
    for ti, c in enumerate(tgt):
        diff = (out[ti].astype(object) - vals % c) % c
        # out = (x + alpha*B) mod c with 0 <= alpha < m
        ok = np.zeros(n, bool)
        for alpha in range(m + 1):
            ok |= diff == (alpha * B) % c
        assert ok.all(), f"target {ti}: non-overshoot mismatch"


def test_matmul_path_matches_direct_loop(rng):
    """The MXU digit-matmul conversion is bit-identical to the loop."""
    two_n = 512
    src = tuple(find_ntt_primes(24, 29.0, two_n))
    tgt = tuple(find_ntt_primes(10, 30.9, two_n, exclude=frozenset(src)))
    t = make_conv_tables(src, tgt)
    B = math.prod(src)
    n = 512
    vals = np.array(
        [int(rng.integers(0, 1 << 62)) for _ in range(n)], object
    ) % B
    x = _random_residues(rng, src, n, vals)
    got = np.asarray(base_convert(x, t))
    lo, hi = rns._MATMUL_MIN_M, rns._MATMUL_MAX_M
    rns_min_save = lo
    try:
        rns._MATMUL_MIN_M = 10**9  # force the direct loop
        want = np.asarray(base_convert(x, t))
    finally:
        rns._MATMUL_MIN_M = rns_min_save
    assert np.array_equal(got, want)


def test_base_convert_centered_small_values(rng):
    """Centered conversion reproduces small signed values exactly."""
    two_n = 512
    src = tuple(find_ntt_primes(8, 29.0, two_n))
    tgt = tuple(find_ntt_primes(6, 30.0, two_n, exclude=frozenset(src)))
    t = make_conv_tables(src, tgt)
    B = math.prod(src)
    n = 256
    signed = rng.integers(-(1 << 40), 1 << 40, n)
    vals = np.array([int(v) % B for v in signed], object)
    x = _random_residues(rng, src, n, vals)
    out = np.asarray(base_convert_centered(x, t))
    for ti, c in enumerate(tgt):
        want = np.array([int(v) % c for v in signed], np.uint64)
        assert np.array_equal(out[ti].astype(np.uint64), want)
