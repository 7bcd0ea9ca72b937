"""Native CRT codec vs the exact Python big-int path."""

import numpy as np
import pytest
from fractions import Fraction

from aes_fhe_tpu import native
from aes_fhe_tpu.params import find_ntt_primes
from aes_fhe_tpu.ckks.encoder import Encoder
from aes_fhe_tpu.params import make_params


def test_native_builds():
    assert native.available(), "g++ build of the native codec failed"


def test_crt_matches_python(rng):
    params = make_params(logn=6, n_level_primes=12, dnum=3)
    enc = Encoder(params)
    primes = params.moduli
    L, N = len(primes), params.n
    # craft residues of known small centered values v (|v| < 2^80)
    v = (rng.integers(-(2**62), 2**62, N).astype(object)) * rng.integers(
        1, 2**17, N
    )
    res = np.empty((L, N), np.uint32)
    for i, q in enumerate(primes):
        res[i] = np.array([int(x) % q for x in v], np.uint32)
    scale = Fraction(1 << 58)
    got = native.crt_centered_to_double(res, primes, float(1 / scale))
    want = np.array([float(Fraction(int(x)) / scale) for x in v])
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-12)


def test_decrypt_uses_native(rng):
    params = make_params(logn=6, n_level_primes=8, dnum=3)
    from aes_fhe_tpu.ckks import CkksContext

    ctx = CkksContext(params, seed=5)
    vals = np.exp(2j * np.pi * rng.random(params.n_slots))
    ct = ctx.encrypt(vals)
    np.testing.assert_allclose(ctx.decrypt_values(ct), vals, atol=1e-9)