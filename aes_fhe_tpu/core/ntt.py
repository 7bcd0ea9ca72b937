"""Negacyclic number-theoretic transforms over RNS limbs.

The NTT is the hot kernel of any RNS FHE engine (reference BASELINE.json calls
it the speed-of-light target; the reference delegated it to desilofhe's
``ntt``/``intt`` verbs, engine_context.py:173-178).  This implementation is the
merged-psi Cooley-Tukey / Gentleman-Sande pair (Longa–Naehrig): the 2N-th root
psi is folded into the twiddle tables, so forward(natural) -> bit-reversed and
inverse(bit-reversed) -> natural realize the *negacyclic* convolution without
separate pre/post scaling passes.

Shapes: polynomials are u32 arrays [..., L, N] (RNS limbs x coefficients);
each of the logN stages is a fully vectorized VPU pass over the whole array,
so XLA fuses the Montgomery arithmetic of a stage into a handful of kernels.
All pointwise ciphertext algebra happens in this (bit-reversed) evaluation
domain; Galois automorphisms become precomputed index permutations of it
(see ckks/keys.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .modular import add_mod, sub_mod, mont_mul

__all__ = [
    "NttTables",
    "build_ntt_tables",
    "ntt",
    "intt",
    "ntt_jit",
    "intt_jit",
    "ntt_host",
    "bit_reverse_perm",
]


class NttTables(NamedTuple):
    """Device-side twiddle tables for a fixed prime list (length L).

    psi / psi_inv : [L, N] Montgomery-form twiddles, indexed per stage as
                    table[:, m:2m] (Longa–Naehrig layout).
    ninv          : [L] Montgomery form of N^-1 (folded into the inverse).
    q, q_neg_inv  : [L] the primes and -q^-1 mod 2^32.
    """

    psi: jnp.ndarray
    psi_inv: jnp.ndarray
    ninv: jnp.ndarray
    q: jnp.ndarray
    q_neg_inv: jnp.ndarray

    @property
    def logn(self) -> int:
        return int(self.psi.shape[-1]).bit_length() - 1


def _primitive_2n_root(q: int, two_n: int) -> int:
    """A root of order exactly 2N mod q (2N a power of two, q = 1 mod 2N)."""
    exp = (q - 1) // two_n
    for g in range(2, 10_000):
        psi = pow(g, exp, q)
        if pow(psi, two_n // 2, q) == q - 1:
            return psi
    raise ValueError(f"no primitive 2N-th root found mod {q}")


@functools.lru_cache(maxsize=64)
def bit_reverse_perm(logn: int) -> np.ndarray:
    n = 1 << logn
    idx = np.arange(n, dtype=np.int64)
    perm = np.zeros(n, dtype=np.int64)
    for b in range(logn):
        perm |= ((idx >> b) & 1) << (logn - 1 - b)
    return perm


def _pow_table(base: np.ndarray, q: np.ndarray, n: int) -> np.ndarray:
    """[L] bases -> [L, n] power tables base^j mod q, vectorized log-doubling
    (u64 exact: q < 2^31 so every partial product < 2^62)."""
    L = base.shape[0]
    out = np.empty((L, n), np.uint64)
    out[:, 0] = 1
    m = 1
    while m < n:
        w = min(m, n - m)
        step = out[:, m - 1] * base % q  # base^m
        out[:, m : m + w] = out[:, :w] * step[:, None] % q[:, None]
        m *= 2
    return out


def build_ntt_tables(primes: tuple[int, ...], logn: int) -> NttTables:
    """Host-exact construction of the twiddle tables (numpy u64 arithmetic)."""
    n = 1 << logn
    two_n = 2 * n
    brev = bit_reverse_perm(logn)
    L = len(primes)
    R = 1 << 32
    qv = np.asarray(primes, np.uint64)
    roots = np.asarray(
        [_primitive_2n_root(q, two_n) for q in primes], np.uint64
    )
    iroots = np.asarray(
        [pow(int(r), -1, int(q)) for r, q in zip(roots, qv)], np.uint64
    )
    pows = _pow_table(roots, qv, n)
    ipows = _pow_table(iroots, qv, n)
    psi_t = ((pows[:, brev] << np.uint64(32)) % qv[:, None]).astype(np.uint32)
    psi_inv_t = ((ipows[:, brev] << np.uint64(32)) % qv[:, None]).astype(
        np.uint32
    )
    ninv_t = np.asarray(
        [(pow(n, -1, int(q)) * R) % int(q) for q in qv], np.uint32
    )
    qs = np.asarray(primes, dtype=np.uint32)
    qinvs = np.asarray([(-pow(int(q), -1, R)) % R for q in primes], np.uint32)
    # numpy on purpose: tables are trace-safe constants; converting here
    # would ship ~25 MB through the host<->TPU tunnel before it's needed.
    return NttTables(
        psi=psi_t, psi_inv=psi_inv_t, ninv=ninv_t, q=qs, q_neg_inv=qinvs
    )


def ntt(x: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Forward negacyclic NTT. x: u32 [..., L, N] natural coefficient order;
    returns the evaluation domain in bit-reversed order."""
    logn = t.logn
    n = 1 << logn
    lead = x.shape[:-1]            # (..., L)
    q = t.q[:, None, None]
    qi = t.q_neg_inv[:, None, None]
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)        # t in the scalar pseudocode
        xs = x.reshape(*lead, m, 2, half)
        u = xs[..., 0, :]
        v = xs[..., 1, :]
        tw = t.psi[:, m : 2 * m][:, :, None]
        vs = mont_mul(v, tw, q, qi)
        x = jnp.stack([add_mod(u, vs, q), sub_mod(u, vs, q)], axis=-2)
        x = x.reshape(*lead, n)
    return x


def intt(x: jnp.ndarray, t: NttTables) -> jnp.ndarray:
    """Inverse negacyclic NTT. x: u32 [..., L, N] bit-reversed evaluation
    order; returns natural coefficient order (scaled by N^-1)."""
    logn = t.logn
    n = 1 << logn
    lead = x.shape[:-1]
    q = t.q[:, None, None]
    qi = t.q_neg_inv[:, None, None]
    for s in range(logn):
        half = 1 << s              # t in the scalar pseudocode
        h = n >> (s + 1)           # number of blocks
        xs = x.reshape(*lead, h, 2, half)
        u = xs[..., 0, :]
        v = xs[..., 1, :]
        tw = t.psi_inv[:, h : 2 * h][:, :, None]
        x = jnp.stack(
            [add_mod(u, v, q), mont_mul(sub_mod(u, v, q), tw, q, qi)],
            axis=-2,
        ).reshape(*lead, n)
    return mont_mul(x, t.ninv[:, None], t.q[:, None], t.q_neg_inv[:, None])


# Coarse-grained jitted entry points.  On this stack, every *eager* op with a
# fresh shape pays a full XLA compile (~0.7 s measured), so the per-stage
# formulation above must only ever run under jit; these wrappers compile the
# whole logN-stage transform into one fused executable per input shape.
ntt_jit = jax.jit(ntt)
intt_jit = jax.jit(intt)


def _host_mont_mul(a: np.ndarray, b: np.ndarray, q, q_neg_inv) -> np.ndarray:
    """Exact numpy Montgomery multiply (u64 REDC), bit-identical to
    modular.mont_mul.  a, b u32 broadcastable; q/q_neg_inv u64-compatible."""
    t = a.astype(np.uint64) * b.astype(np.uint64)
    m = (t & np.uint64(0xFFFFFFFF)).astype(np.uint32) * np.asarray(
        q_neg_inv, np.uint32
    )  # wrapping u32 multiply
    r = (t + m.astype(np.uint64) * np.asarray(q, np.uint64)) >> np.uint64(32)
    qv = np.asarray(q, np.uint64)
    return np.where(r >= qv, r - qv, r).astype(np.uint32)


def ntt_host(x: np.ndarray, t: NttTables) -> np.ndarray:
    """Pure-numpy forward negacyclic NTT, bit-identical to ``ntt``.

    Exists so *constant* plaintexts (LUT masks and the like) can be encoded
    eagerly even while a jit trace is in progress — a device NTT there would
    return tracers and poison any host-side plaintext cache (the classic
    leaked-tracer bug)."""
    psi = np.asarray(t.psi)
    q = np.asarray(t.q)[:, None]
    qi = np.asarray(t.q_neg_inv)[:, None]
    logn = int(psi.shape[-1]).bit_length() - 1
    n = 1 << logn
    lead = x.shape[:-1]
    x = np.asarray(x, np.uint32)
    for s in range(logn):
        m = 1 << s
        half = n >> (s + 1)
        xs = x.reshape(*lead, m, 2, half)
        u, v = xs[..., 0, :], xs[..., 1, :]
        tw = psi[:, m : 2 * m][:, :, None]
        vs = _host_mont_mul(v, tw, q[..., None], qi[..., None])
        s_ = u + vs
        qv = np.asarray(q[..., None], np.uint32)
        add = np.where(s_ >= qv, s_ - qv, s_)
        sub = np.where(u >= vs, u - vs, u - vs + qv)
        x = np.stack([add, sub], axis=-2).reshape(*lead, n)
    return x
