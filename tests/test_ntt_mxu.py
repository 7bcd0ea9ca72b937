"""MXU four-step NTT: bit-exact parity with the butterfly transform.

The four-step matmul transform (core/ntt_mxu.py) must be bit-identical to
core.ntt's merged-psi butterfly NTT in both directions, including the
bit-reversed output/input orderings, or it cannot replace it inside the
keyswitch path (reference NTT verbs: engine_context.py:173-178).
"""

import numpy as np
import pytest

from aes_fhe_tpu.params import find_ntt_primes
from aes_fhe_tpu.core.ntt import build_ntt_tables, ntt_jit, intt_jit
from aes_fhe_tpu.core.ntt_mxu import build_mxu_tables, ntt_mxu, intt_mxu

pytestmark = pytest.mark.fast


@pytest.mark.parametrize("logn", [8, 9, 10])
def test_mxu_matches_butterfly(logn):
    primes = tuple(find_ntt_primes(3, 29.0, 2 << logn))
    t = build_ntt_tables(primes, logn)
    tm = build_mxu_tables(primes, logn)
    rng = np.random.default_rng(7)
    x = (
        rng.integers(0, np.asarray(primes)[:, None], (2, len(primes), 1 << logn))
    ).astype(np.uint32)
    want = np.asarray(ntt_jit(x, t))
    got = np.asarray(ntt_mxu(x, tm))
    assert np.array_equal(got, want)
    back = np.asarray(intt_mxu(got, tm))
    assert np.array_equal(back, x)
    # cross: butterfly forward -> mxu inverse and vice versa
    assert np.array_equal(np.asarray(intt_jit(got, t)), x)


def test_mxu_factor_choice():
    primes = tuple(find_ntt_primes(2, 29.0, 2 << 9))
    tm = build_mxu_tables(primes, 9)
    assert tm.a_dim * tm.b_dim == 1 << 9
    assert tm.a_dim >= tm.b_dim
