"""Golden tests for u32 modular primitives vs exact numpy u64 arithmetic."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from aes_fhe_tpu.core import modular as _M
from aes_fhe_tpu.params import find_ntt_primes

pytestmark = pytest.mark.fast

PRIMES = find_ntt_primes(4, 29.0, 1 << 9) + find_ntt_primes(2, 30.98, 1 << 9)


class M:
    """Jitted views of the modular kernels (eager per-op compiles are ~0.7s
    on this stack, so tests always go through jit)."""

    mul_hi = staticmethod(jax.jit(_M.mul_hi))
    add_mod = staticmethod(jax.jit(_M.add_mod))
    sub_mod = staticmethod(jax.jit(_M.sub_mod))
    neg_mod = staticmethod(jax.jit(_M.neg_mod))
    mont_mul = staticmethod(jax.jit(_M.mont_mul))
    mont_redc = staticmethod(jax.jit(_M.mont_redc))
    barrett_reduce = staticmethod(jax.jit(_M.barrett_reduce))
    mont_constants = staticmethod(_M.mont_constants)


def _rand_u32(rng, n, bound=None):
    hi = (1 << 32) if bound is None else bound
    return rng.integers(0, hi, size=n, dtype=np.uint64)


def test_mul_hi(rng):
    a = _rand_u32(rng, 4096)
    b = _rand_u32(rng, 4096)
    want = (a * b) >> np.uint64(32)
    got = M.mul_hi(jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32))
    np.testing.assert_array_equal(np.asarray(got, np.uint64), want)


def test_add_sub_neg_mod(rng):
    for q in PRIMES:
        a = _rand_u32(rng, 1024, q)
        b = _rand_u32(rng, 1024, q)
        qj = jnp.uint32(q)
        aj, bj = jnp.asarray(a, jnp.uint32), jnp.asarray(b, jnp.uint32)
        ai, bi = a.astype(np.int64), b.astype(np.int64)
        np.testing.assert_array_equal(np.asarray(M.add_mod(aj, bj, qj), np.int64), (ai + bi) % q)
        np.testing.assert_array_equal(np.asarray(M.sub_mod(aj, bj, qj), np.int64), (ai - bi) % q)
        np.testing.assert_array_equal(np.asarray(M.neg_mod(aj, qj), np.int64), (-ai) % q)


def test_mont_mul_exact(rng):
    R = 1 << 32
    for q in PRIMES:
        consts = M.mont_constants([q])
        a = _rand_u32(rng, 2048, q)
        b = _rand_u32(rng, 2048, q)
        b_mont = (b * np.uint64(R)) % np.uint64(q)  # b*R mod q, exact in u64? b<2^31 so b<<32 < 2^63
        got = M.mont_mul(
            jnp.asarray(a, jnp.uint32),
            jnp.asarray(b_mont, jnp.uint32),
            jnp.uint32(q),
            jnp.uint32(int(consts["q_neg_inv"][0])),
        )
        np.testing.assert_array_equal(np.asarray(got, np.uint64), a * b % q)


def test_mont_roundtrip_via_r2(rng):
    for q in PRIMES:
        consts = M.mont_constants([q])
        a = _rand_u32(rng, 512, q)
        aj = jnp.asarray(a, jnp.uint32)
        qj = jnp.uint32(q)
        qi = jnp.uint32(int(consts["q_neg_inv"][0]))
        a_mont = M.mont_mul(aj, jnp.uint32(int(consts["r2"][0])), qj, qi)
        back = M.mont_redc(jnp.zeros_like(aj), a_mont, qj, qi)
        np.testing.assert_array_equal(np.asarray(back), a.astype(np.uint32))


def test_barrett_reduce(rng):
    for q in PRIMES:
        mu = (1 << 32) // q
        y = _rand_u32(rng, 4096)
        got = M.barrett_reduce(
            jnp.asarray(y, jnp.uint32), jnp.uint32(q), jnp.uint32(mu)
        )
        np.testing.assert_array_equal(np.asarray(got, np.uint64), y % q)
