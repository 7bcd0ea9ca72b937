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

def test_pallas_context_bit_exact_verbs(rng):
    """A context with ntt_impl='pallas' (interpret mode on CPU) produces
    bit-identical ciphertexts to the XLA path through the compound verbs
    that embed NTTs: multiply (tensor+relin+rescale), rotate, conjugate,
    to_coeff/to_eval, and hoisted rotate_many."""
    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext

    params = make_params(logn=8, n_level_primes=8, dnum=3)
    ctxs = [
        CkksContext(params, seed=3, rotations=(1, 5), ntt_impl=impl)
        for impl in ("xla", "pallas")
    ]
    vals = rng.standard_normal(params.n_slots) * 0.5
    outs = []
    for ctx in ctxs:
        # identical seed => identical sampled randomness => identical cts
        a = ctx.encrypt(vals)
        b = ctx.encrypt(vals + 0.25)
        m = ctx.multiply(a, b, drop=1)
        r = ctx.rotate(m, 5)
        c = ctx.conjugate(r)
        c = ctx.to_eval(ctx.to_coeff(c))
        h = ctx.rotate_many(a, [1, 5])
        outs.append((np.asarray(c.data), [np.asarray(x.data) for x in h]))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    for x, y in zip(outs[0][1], outs[1][1]):
        np.testing.assert_array_equal(x, y)


def test_pallas_under_jit_fn(rng):
    """Whole-program jit (jit_fn: keys/tables threaded as arguments) with the
    Pallas NTT dispatch: tables must arrive as tracers (no giant constants)
    and results must match the eager pallas path bit-exactly."""
    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext

    params = make_params(logn=8, n_level_primes=8, dnum=3)
    ctx = CkksContext(params, seed=3, rotations=(5,), ntt_impl="pallas")
    vals = rng.standard_normal(params.n_slots) * 0.5
    a = ctx.encrypt(vals)
    b = ctx.encrypt(vals + 0.25)

    def f(a, b):
        return ctx.rotate(ctx.multiply(a, b, drop=1), 5)

    want = f(a, b)
    got = ctx.jit_fn(f, fallback=False)(a, b)
    np.testing.assert_array_equal(np.asarray(got.data), np.asarray(want.data))
    assert got.scale == want.scale
