"""Exact modular arithmetic on uint32 residues, built for the TPU VPU.

TPUs have no 64-bit integer multiplier, so every 32x32->64 product is
decomposed into 16-bit partial products on native u32 lanes (wrapping
semantics).  All primes are < 2^31, which guarantees:

- Montgomery REDC intermediates fit u32 without overflow;
- `a + b` of two residues fits u32 (2p < 2^32);
- Barrett reduction of an arbitrary u32 needs at most two corrections.

Everything here is plain vectorized jax.numpy: it fuses under jit, vmaps over
leading axes, and the same formulation drops into a Pallas kernel unchanged.
Residues live in *standard* domain; constants that participate in products
(twiddles, key-switch keys, plaintext masks, inverse factors) are premultiplied
by R = 2^32 ("Montgomery form") so a single REDC per product gives an exact
standard-domain result.

This module replaces the innermost layer of the reference's closed-source
desilofhe engine (reference: engine_context.py:1; SURVEY.md section 2.2).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "mul_lo",
    "mul_hi",
    "add_mod",
    "sub_mod",
    "neg_mod",
    "mont_redc",
    "mont_mul",
    "barrett_reduce",
    "mont_constants",
    "host_to_mont",
]

_U32 = jnp.uint32
# plain ints: weak-typed literals stay out of jit/pallas closures
MASK16 = 0xFFFF


def mul_lo(a, b):
    """Low 32 bits of a*b (native wrapping u32 multiply)."""
    return (a * b).astype(_U32)


def mul_hi(a, b):
    """High 32 bits of the 64-bit product a*b, via 16-bit partial products."""
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    lo = a0 * b0          # exact: < 2^32
    m1 = a1 * b0
    m2 = a0 * b1
    hi = a1 * b1
    mid = m1 + m2         # may wrap once
    carry_mid = (mid < m1).astype(_U32)
    t = (lo >> 16) + (mid & MASK16)   # < 2^17, exact
    return hi + (mid >> 16) + (carry_mid << 16) + (t >> 16)


def add_mod(a, b, q):
    """(a + b) mod q for residues a, b in [0, q); q < 2^31 so no wrap."""
    s = a + b
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    """(a - b) mod q for residues in [0, q)."""
    d = a - b
    return jnp.where(a >= b, d, d + q)


def neg_mod(a, q):
    """(-a) mod q."""
    return jnp.where(a == 0, a, q - a)


def mont_redc(t_hi, t_lo, q, q_neg_inv):
    """Montgomery REDC: returns (t_hi*2^32 + t_lo) * 2^-32 mod q.

    Requires t_hi < q (true for t = a*b with a, b < q < 2^31) and
    q_neg_inv = -q^{-1} mod 2^32.
    """
    m = mul_lo(t_lo, q_neg_inv)
    mq_hi = mul_hi(m, q)
    carry = (t_lo != 0).astype(_U32)
    r = t_hi + mq_hi + carry          # < 2q < 2^32
    return jnp.where(r >= q, r - q, r)


def mont_mul(a, b, q, q_neg_inv):
    """a * b * 2^-32 mod q.

    With b premultiplied by R = 2^32 (Montgomery form), this is an exact
    standard-domain product a*b mod q in one REDC.
    """
    return mont_redc(mul_hi(a, b), mul_lo(a, b), q, q_neg_inv)


def barrett_reduce(y, q, mu):
    """y mod q for arbitrary u32 y, with mu = floor(2^32 / q) precomputed.

    The approximate quotient mulhi(y, mu) is within 2 of floor(y/q), so two
    conditional subtractions suffice.
    """
    qhat = mul_hi(y, mu)
    r = y - qhat * q
    r = jnp.where(r >= q, r - q, r)
    return jnp.where(r >= q, r - q, r)


# ---------------------------------------------------------------------------
# Host-side constant precomputation (exact Python ints -> numpy u32).
# ---------------------------------------------------------------------------

def mont_constants(primes) -> dict[str, np.ndarray]:
    """Per-prime Montgomery/Barrett constants, each shaped [L] u32.

    Keys: q, q_neg_inv (-q^-1 mod 2^32), r2 (R^2 mod q, to enter Montgomery
    form on device), mu (floor(2^32/q) for Barrett).
    """
    R = 1 << 32
    qs, qinvs, r2s, mus = [], [], [], []
    for q in primes:
        qs.append(q)
        qinvs.append((-pow(q, -1, R)) % R)
        r2s.append((R * R) % q)
        mus.append(R // q)
    u = lambda xs: np.asarray(xs, dtype=np.uint32)
    return {"q": u(qs), "q_neg_inv": u(qinvs), "r2": u(r2s), "mu": u(mus)}


def host_to_mont(values: np.ndarray, primes) -> np.ndarray:
    """Exact host-side conversion to Montgomery form: v * 2^32 mod q.

    ``values``: integer array broadcastable to [..., L, ...]; ``primes`` the
    matching prime list along the L axis (axis -2 by convention here the
    caller reshapes; this helper expects values[..., i] to pair with
    primes[i] along the *leading* axis of the last-two convention used by
    callers — see core/ntt.py table builders for usage).
    """
    R = 1 << 32
    vals = np.asarray(values, dtype=np.uint64)
    out = np.empty_like(vals)
    for i, q in enumerate(primes):
        out[i] = (vals[i].astype(object) * R % q).astype(np.uint64)
    return out.astype(np.uint32)
