"""Pallas fused NTT vs the XLA path: bit-exact equivalence (interpret mode
on the CPU mesh; the real-TPU path is exercised by bench/integration)."""

import numpy as np
import pytest
import jax.numpy as jnp

from aes_fhe_tpu.core.ntt import build_ntt_tables, ntt_jit, intt_jit
from aes_fhe_tpu.core.ntt_pallas import (
    build_pallas_tables,
    ntt_pl,
    intt_pl,
)
from aes_fhe_tpu.params import find_ntt_primes


@pytest.mark.parametrize("logn,lanes", [(6, 8), (8, 16), (10, 128)])
def test_pallas_ntt_bit_exact(logn, lanes, rng):
    primes = tuple(find_ntt_primes(3, 29.0, 2 << logn))
    t = build_ntt_tables(primes, logn)
    pt = build_pallas_tables(t, lanes=lanes)
    n = 1 << logn
    a = np.stack(
        [
            rng.integers(0, q, size=n, dtype=np.uint64).astype(np.uint32)
            for q in primes
        ]
    )
    aj = jnp.asarray(a)
    want_f = np.asarray(ntt_jit(aj, t))
    got_f = np.asarray(ntt_pl(aj, pt, interpret=True))
    np.testing.assert_array_equal(got_f, want_f)

    want_b = np.asarray(intt_jit(jnp.asarray(want_f), t))
    got_b = np.asarray(intt_pl(jnp.asarray(want_f), pt, interpret=True))
    np.testing.assert_array_equal(got_b, want_b)
    np.testing.assert_array_equal(got_b, a)


def test_pallas_ntt_batched(rng):
    logn, lanes = 7, 8
    primes = tuple(find_ntt_primes(2, 29.0, 2 << logn))
    t = build_ntt_tables(primes, logn)
    pt = build_pallas_tables(t, lanes=lanes)
    n = 1 << logn
    a = np.stack(
        [
            np.stack(
                [
                    rng.integers(0, q, n, dtype=np.uint64).astype(np.uint32)
                    for q in primes
                ]
            )
            for _ in range(3)
        ]
    )
    aj = jnp.asarray(a)
    np.testing.assert_array_equal(
        np.asarray(ntt_pl(aj, pt, interpret=True)),
        np.asarray(ntt_jit(aj, t)),
    )