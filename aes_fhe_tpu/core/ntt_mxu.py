"""Four-step negacyclic NTT as MXU matmuls (the round-2 keyswitch lever).

The butterfly NTT (core/ntt.py, core/ntt_pallas.py) is VPU-bound: ~logN
sequential stages of Montgomery butterflies.  The MXU (256x256 systolic
array on v5e) runs dense modular matmuls ~2 orders of magnitude faster than
the VPU runs butterflies, so this module reformulates the size-N negacyclic
transform as the classic four-step algorithm:

    x.reshape(A, B)                     (N = A*B, column-major split j = j1*B + j2)
    U   = M1 @ X        -- A-point negacyclic NTTs down the columns
    U'  = T * U         -- pointwise twiddle  T[r, j2] = psi^{j2*(2*k1(r)+1)}
    out = U' @ M2^T     -- B-point cyclic DFTs along the rows

with   M1[r, j1] = psi^{B*j1*(2*k1(r)+1)}   (k1(r) = bitrev_log2A(r))
       M2[c, j2] = omega^{A*j2*k2(c)}        (omega = psi^2, k2(c) = bitrev_log2B(c))

The row/column bit-reversals are folded into the matrix row orders so the
flattened output is **bit-identical** to ``core.ntt.ntt`` (forward: natural ->
bit-reversed; inverse: bit-reversed -> natural, with N^-1 folded into the
inverse matrix M1i).

Exact modular matmul on the MXU follows the digit-plane recipe proven in
``core/rns._conv_matmul`` (the reference delegated its NTTs to desilofhe's
closed ``ntt``/``intt`` verbs, engine_context.py:173-178): both operands
split into 8-bit planes — integers <= 255 are exact in bfloat16 — and each
of the 7 shift classes accumulates in f32.  f32 holds integers exactly up to
2^24, so the contraction is CHUNKED to 64 terms: a class sums at most
255*255*64*4 = 16,646,400 < 2^24 = 16,777,216 — every partial product and
partial sum is an exactly-representable integer, making the transform
bit-exact (locked by tests/test_ntt_mxu.py against core.ntt).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from .modular import add_mod, mont_mul
from .ntt import bit_reverse_perm, _primitive_2n_root, _pow_table

__all__ = ["MxuNttTables", "build_mxu_tables", "ntt_mxu", "intt_mxu"]

_R = 1 << 32


class MxuNttTables(NamedTuple):
    """Per-prime four-step tables.  L = number of primes, N = A*B.

    m1 / m2   : [4, L, A, A] / [4, L, B, B] bf16 — 8-bit digit planes of the
                step matrices (standard form), contraction dim LAST so the
                einsum is ``pla b, l b n -> l a n``-shaped on the MXU.
    m1i / m2i : inverse counterparts (N^-1 folded into m1i).
    tw / twi  : [L, A, B] u32 Montgomery twiddles (forward / inverse).
    pow6_mont : [9, L] u32 — (2^{6s} * R mod q) digit-recombination factors
                for the 4x6-plane product classes s = 0..8.
    q, q_neg_inv : [L] u32.
    """

    m1: jnp.ndarray
    m2: jnp.ndarray
    m1i: jnp.ndarray
    m2i: jnp.ndarray
    tw: jnp.ndarray
    twi: jnp.ndarray
    pow6_mont: jnp.ndarray
    q: jnp.ndarray
    q_neg_inv: jnp.ndarray

    @property
    def a_dim(self) -> int:
        return self.m1.shape[-1]

    @property
    def b_dim(self) -> int:
        return self.m2.shape[-1]


def _digit_planes_8(m: np.ndarray) -> np.ndarray:
    """u64 [L, r, c] -> [4, L, r, c] bf16 planes of 8-bit digits (exact)."""
    return jnp.asarray(
        np.stack(
            [((m >> (8 * k)) & 0xFF).astype(np.float32) for k in range(4)]
        ),
        jnp.bfloat16,
    )


def build_mxu_tables(
    primes: tuple[int, ...], logn: int, log_a: int | None = None
) -> MxuNttTables:
    """Host-exact table construction.  ``log_a`` defaults to ceil(logn/2)
    (A = the larger factor, so the A-matmul has lane dim B >= 128)."""
    n = 1 << logn
    if log_a is None:
        log_a = (logn + 1) // 2
    log_b = logn - log_a
    A, B = 1 << log_a, 1 << log_b
    L = len(primes)
    qv = np.asarray(primes, np.uint64)

    ra = bit_reverse_perm(log_a)
    rb = bit_reverse_perm(log_b)

    m1 = np.empty((L, A, A), np.uint64)
    m2 = np.empty((L, B, B), np.uint64)
    m1i = np.empty((L, A, A), np.uint64)
    m2i = np.empty((L, B, B), np.uint64)
    tw = np.empty((L, A, B), np.uint64)
    twi = np.empty((L, A, B), np.uint64)

    for i, q in enumerate(qv):
        q = int(q)
        psi = _primitive_2n_root(q, 2 * n)
        pw = _pow_table(
            np.asarray([psi], np.uint64), np.asarray([q], np.uint64), 2 * n
        )[0]
        ipw = pw[(2 * n - np.arange(2 * n)) % (2 * n)]  # psi^{-t}
        ninv = pow(n, -1, q)

        j1 = np.arange(A)
        k1 = ra  # k1(r) = bitrev(r): folds the output bit-reversal into M1
        j2 = np.arange(B)
        k2 = rb
        mont = lambda v: (v << np.uint64(32)) % np.uint64(q)  # v < 2^31

        # M1[r, j1] = psi^{B*j1*(2*k1(r)+1) mod 2N}
        m1[i] = pw[(B * np.outer(2 * k1 + 1, j1)) % (2 * n)]
        # M2[c, j2] = omega^{A*j2*k2(c)} = psi^{2*A*j2*k2(c) mod 2N}
        m2[i] = pw[(2 * A * np.outer(k2, j2)) % (2 * n)]
        # twiddle T[r, j2] = psi^{j2*(2*k1(r)+1) mod 2N}, Montgomery form
        tw[i] = mont(pw[np.outer(2 * k1 + 1, j2) % (2 * n)])

        # ---- inverse: run the steps backwards with negated exponents ----
        # M2i[j2, c] = B^-1 * omega^{-A*j2*k2(c)}      (undo B-point DFTs)
        # Ti[r, j2]  = psi^{-j2*(2*k1(r)+1)}           (undo twiddle)
        # M1i[j1, r] = A^-1 * psi^{-B*j1*(2*k1(r)+1)}  (undo A-point NTTs)
        # A^-1 * B^-1 = N^-1: the usual inverse-NTT scaling, folded in.
        neg = lambda e: (2 * n - e % (2 * n)) % (2 * n)
        m2i[i] = pw[neg(2 * A * np.outer(j2, k2))] * pow(B, -1, q) % q
        twi[i] = mont(pw[neg(np.outer(2 * k1 + 1, j2))])
        m1i[i] = pw[neg(B * np.outer(j1, 2 * k1 + 1))] * pow(A, -1, q) % q

    pow6 = np.empty((9, L), np.uint32)
    for s in range(9):
        for i, q in enumerate(qv):
            pow6[s, i] = (1 << (6 * s)) * _R % int(q)

    u32 = lambda a: jnp.asarray(np.asarray(a, np.uint32))
    qinvs = np.asarray([(-pow(int(q), -1, _R)) % _R for q in qv], np.uint32)
    return MxuNttTables(
        m1=_digit_planes_8(m1),
        m2=_digit_planes_8(m2),
        m1i=_digit_planes_8(m1i),
        m2i=_digit_planes_8(m2i),
        tw=u32(tw),
        twi=u32(twi),
        pow6_mont=jnp.asarray(pow6),
        q=u32(qv),
        q_neg_inv=jnp.asarray(qinvs),
    )


def _mod_matmul(
    planes_m: jnp.ndarray,  # [4, L, out, K] bf16 8-bit digit planes
    x: jnp.ndarray,  # [..., L, K, cols] u32 standard
    t: MxuNttTables,
) -> jnp.ndarray:
    """Exact (M @ X) mod q per limb on the MXU.

    Both operands in 8-bit planes; digit-product classes s = j+k (weight
    2^{8s}) accumulate in f32 with the contraction chunked to 64 terms so
    every class sum <= 255*255*64*4 = 16,646,400 < 2^24 stays an exact f32
    integer; each chunk's classes recombine mod q via the 6-bit Montgomery
    ladder (_mont_shift)."""
    K = x.shape[-2]
    q = t.q[:, None, None]
    qi = t.q_neg_inv[:, None, None]
    xp = [((x >> (8 * k)) & 0xFF).astype(jnp.bfloat16) for k in range(4)]
    # split the contraction so every f32 class sum stays < 2^24
    n_chunks = max(1, K // 64)
    csz = K // n_chunks
    acc = None
    for c in range(n_chunks):
        sl = slice(c * csz, (c + 1) * csz)
        mc = planes_m[:, :, :, sl]
        xc = [p[..., sl, :] for p in xp]
        for s in range(7):
            p_s = None
            for j in range(max(0, s - 3), min(4, s + 1)):
                k = s - j
                part = jnp.einsum(
                    "lak,...lkn->...lan",
                    mc[j],
                    xc[k],
                    preferred_element_type=jnp.float32,
                )
                p_s = part if p_s is None else p_s + part
            # 2^{8s} = 2^{6s} * 2^{2s}: fold 2^{2s} into the u32 before the
            # Montgomery multiply (p_s < 2^24, so << 2s keeps u32 exact for
            # s <= 3; for s >= 4 use the pow6 ladder twice)
            term = _mont_shift(p_s.astype(jnp.uint32), 8 * s, t, q, qi)
            acc = term if acc is None else add_mod(acc, term, q)
    return acc


def _mont_shift(v: jnp.ndarray, shift: int, t: MxuNttTables, q, qi):
    """v * 2^shift mod q for v < 2^24 via the 6-bit Montgomery ladder."""
    # shift = 6*a + b with b < 6: fold 2^b as an in-u32 left shift (exact:
    # v < 2^24, b <= 5 -> < 2^29), then one Montgomery mult by 2^{6a}*R.
    a, b = divmod(shift, 6)
    v = v << np.uint32(b)
    return mont_mul(v, t.pow6_mont[a][:, None, None], q, qi)


def ntt_mxu(x: jnp.ndarray, t: MxuNttTables) -> jnp.ndarray:
    """Forward negacyclic NTT, bit-identical to ``core.ntt.ntt``.

    x: u32 [..., L, N] natural order -> [..., L, N] bit-reversed.
    """
    A, B = t.a_dim, t.b_dim
    lead = x.shape[:-1]
    xm = x.reshape(*lead, A, B)
    u = _mod_matmul(t.m1, xm, t)  # [..., L, A, B]
    q = t.q[:, None, None]
    qi = t.q_neg_inv[:, None, None]
    u = mont_mul(u, t.tw, q, qi)
    # row-wise B-point DFT: out[r, c] = sum_j2 u[r, j2] * M2[c, j2]
    # = (M2 @ u^T)^T; run as matmul with contraction on the last axis of u.
    v = _mod_matmul_rows(t.m2, u, t)
    return v.reshape(*lead, A * B)


def intt_mxu(x: jnp.ndarray, t: MxuNttTables) -> jnp.ndarray:
    """Inverse negacyclic NTT, bit-identical to ``core.ntt.intt``.

    x: u32 [..., L, N] bit-reversed -> [..., L, N] natural order.
    """
    A, B = t.a_dim, t.b_dim
    lead = x.shape[:-1]
    xm = x.reshape(*lead, A, B)
    u = _mod_matmul_rows(t.m2i, xm, t)  # undo the B-point DFTs
    q = t.q[:, None, None]
    qi = t.q_neg_inv[:, None, None]
    u = mont_mul(u, t.twi, q, qi)
    v = _mod_matmul(t.m1i, u, t)  # undo the A-point NTTs (N^-1 folded)
    return v.reshape(*lead, A * B)


def _mod_matmul_rows(
    planes_m: jnp.ndarray, u: jnp.ndarray, t: MxuNttTables
) -> jnp.ndarray:
    """out[..., r, c] = sum_j m[c, j] * u[..., r, j] mod q (contraction on
    the last axis; same exactness budget as _mod_matmul)."""
    K = u.shape[-1]
    q = t.q[:, None, None]
    qi = t.q_neg_inv[:, None, None]
    up = [((u >> (8 * k)) & 0xFF).astype(jnp.bfloat16) for k in range(4)]
    n_chunks = max(1, K // 64)
    csz = K // n_chunks
    acc = None
    for c in range(n_chunks):
        sl = slice(c * csz, (c + 1) * csz)
        mc = planes_m[:, :, :, sl]
        uc = [p[..., sl] for p in up]
        for s in range(7):
            p_s = None
            for j in range(max(0, s - 3), min(4, s + 1)):
                k = s - j
                part = jnp.einsum(
                    "lck,...lrk->...lrc",
                    mc[j],
                    uc[k],
                    preferred_element_type=jnp.float32,
                )
                p_s = part if p_s is None else p_s + part
            term = _mont_shift(p_s.astype(jnp.uint32), 8 * s, t, q, qi)
            acc = term if acc is None else add_mod(acc, term, q)
    return acc
