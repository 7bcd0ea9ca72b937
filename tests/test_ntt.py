"""NTT correctness: roundtrip, linearity, and negacyclic convolution vs a
naive O(N^2) schoolbook model (exact integer arithmetic)."""

import numpy as np
import pytest
import jax.numpy as jnp

from aes_fhe_tpu.core.ntt import build_ntt_tables, ntt_jit as ntt, intt_jit as intt
from aes_fhe_tpu.params import find_ntt_primes

pytestmark = pytest.mark.fast


def _naive_negacyclic(a, b, q):
    """(a * b) mod (X^N + 1, q) — exact via Python ints."""
    n = len(a)
    out = [0] * n
    for i in range(n):
        ai = int(a[i])
        if ai == 0:
            continue
        for j in range(n):
            k = i + j
            prod = ai * int(b[j])
            if k < n:
                out[k] = (out[k] + prod) % q
            else:
                out[k - n] = (out[k - n] - prod) % q
    return np.array(out, dtype=np.uint64)


def _sample_polys(rng, logn, primes):
    n = 1 << logn
    L = len(primes)
    a = np.empty((L, n), np.uint32)
    for i, q in enumerate(primes):
        a[i] = rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
    return a


def test_ntt_roundtrip(rng):
    for logn in (4, 8, 10):
        primes = tuple(find_ntt_primes(3, 29.0, 2 << logn))
        t = build_ntt_tables(primes, logn)
        a = _sample_polys(rng, logn, primes)
        back = intt(ntt(jnp.asarray(a), t), t)
        np.testing.assert_array_equal(np.asarray(back), a)


def test_ntt_negacyclic_convolution(rng):
    logn = 6
    primes = tuple(find_ntt_primes(2, 29.0, 2 << logn))
    t = build_ntt_tables(primes, logn)
    a = _sample_polys(rng, logn, primes)
    b = _sample_polys(rng, logn, primes)
    fa, fb = ntt(jnp.asarray(a), t), ntt(jnp.asarray(b), t)
    # pointwise product in the evaluation domain (enter Montgomery via r2)
    from aes_fhe_tpu.core.modular import mont_constants, mont_mul

    consts = mont_constants(primes)
    q = jnp.asarray(consts["q"])[:, None]
    qi = jnp.asarray(consts["q_neg_inv"])[:, None]
    r2 = jnp.asarray(consts["r2"])[:, None]
    fb_mont = mont_mul(fb, r2, q, qi)
    fc = mont_mul(fa, fb_mont, q, qi)
    c = np.asarray(intt(fc, t))
    for i, p in enumerate(primes):
        want = _naive_negacyclic(a[i], b[i], p)
        np.testing.assert_array_equal(c[i].astype(np.uint64), want)


def test_ntt_batched_leading_dims(rng):
    logn = 5
    primes = tuple(find_ntt_primes(2, 29.0, 2 << logn))
    t = build_ntt_tables(primes, logn)
    a = np.stack([_sample_polys(rng, logn, primes) for _ in range(3)])
    one = ntt(jnp.asarray(a[1]), t)
    batched = ntt(jnp.asarray(a), t)
    np.testing.assert_array_equal(np.asarray(batched[1]), np.asarray(one))
