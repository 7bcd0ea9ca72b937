"""LUT evaluation over root-of-unity codewords — the TPU-first redesign.

The reference evaluated bivariate LUTs as 64+ sequential engine calls, each
with its own relinearization (reference: xor4_lut.py:63-74 hot loop;
mixcol_final.py:80-91), and univariate S-box LUTs via a full 128-element
power basis (sub_bytes_lut.py:60).  Here the algebra is restructured around
what is cheap on a TPU under XLA:

1. *Factorized bivariate sums*:  sum_{p,q} c_pq X^p Y^q
      = sum_p X^p (x) U_p,   U_p = sum_q c_pq Y^q,
   where the inner sums are scalar-weighted 2-poly accumulations (per-limb
   scalar Montgomery multiplies — no key switching at all) and only the outer
   combination uses ciphertext x ciphertext tensor products.
2. *Lazy relinearization*: tensor products accumulate as 3-poly ciphertexts;
   ONE key switch relinearizes the whole sum (vs one per term).
3. *Exact scale targeting*: every coefficient scalar is encoded at exactly
   S_pre / (s_x * s_y) (tracked as Fractions at trace time), so all terms in
   an accumulation share one exact scale and every LUT output lands at
   exactly the requested output scale after rescaling.
4. *Depth-aware power schedules*: only the powers a coefficient set actually
   touches are built (XOR4 needs just odd powers: 4 multiplies + 4
   conjugations per operand instead of a dense 8-basis), with splits chosen
   to minimize multiplicative depth.  Conjugate mirroring x^k = conj(x^{m-k})
   follows the reference's trick (xor4_lut.py:53-59) as a first-class basis
   feature.

Baby-step/giant-step S-box evaluation reuses this exact machinery: the
"X powers" are the giants x^{16j} and the "Y powers" the babies x^i, so one
evaluator serves XOR4, the GF-mult tables, and the degree-255 S-box.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from ..ckks.context import CkksContext
from ..ckks.types import Ciphertext

__all__ = [
    "power_schedule",
    "build_power_basis",
    "eval_lut_2d",
    "MIN_COEFF_SCALE_BITS",
]

# Minimum bits of scale a coefficient scalar may be encoded at (precision of
# the LUT coefficients; 2^-24 relative error on ~0.06-magnitude coefficients
# keeps the zeta16 phase decode comfortably exact).
MIN_COEFF_SCALE_BITS = 24


def power_schedule(targets: set[int]) -> list[tuple[int, int, int]]:
    """Multiplication schedule [(k, a, b)] with a + b = k building every
    target power.

    Depth is the scarce resource (every multiply burns rescale limbs), so the
    near-balanced binary split (depth ceil(log2 k)) is always considered and
    an existing pair is used only when it is at least as shallow.  E.g. for
    XOR4's odd targets {3,5,7}, x^7 goes through an extra x^4 at depth 3
    rather than chaining x^5*x^2 at depth 4.
    """
    have = {1: 0}
    sched: list[tuple[int, int, int]] = []

    def depth_if_built(k: int) -> int:
        if k in have:
            return have[k]
        a = (k + 1) // 2
        return max(depth_if_built(a), depth_if_built(k - a)) + 1

    def build(k: int) -> None:
        if k in have:
            return
        cands = [
            (max(have[a], have[k - a]) + 1, a)
            for a in have
            if a < k and (k - a) in have
        ]
        a_bin = (k + 1) // 2
        d_bin = max(depth_if_built(a_bin), depth_if_built(k - a_bin)) + 1
        if cands and min(cands)[0] <= d_bin:
            d, a = min(cands)
            sched.append((k, a, k - a))
            have[k] = d
            return
        build(a_bin)
        build(k - a_bin)
        sched.append((k, a_bin, k - a_bin))
        have[k] = max(have[a_bin], have[k - a_bin]) + 1

    for k in sorted(targets):
        if k > 1:
            build(k)
    return sched


def build_power_basis(
    ctx: CkksContext,
    ct: Ciphertext,
    targets: set[int],
    mirror: int | None = None,
    drop: int | None = None,
    serialize: bool = False,
) -> dict[int, Ciphertext]:
    """Powers ct^k for k in targets (2-poly, relinearized).

    With ``mirror=m`` (input on the order-m codebook, |ct| = 1), powers
    k > m/2 are realized as conj(ct^{m-k}) — one Galois key switch instead of
    a deeper multiplication chain (reference: xor4_lut.py:53-59).

    ``drop`` overrides the per-multiply rescale count (default: the chain's
    rescale_drop) — the bootstrap's double-scale interior passes 2 on
    single-prime chains so basis scales stay pinned near its working scale
    instead of ballooning as scale^2/q per level.

    ``serialize`` gates every multiply on the previous one with an
    optimization barrier.  Same-depth powers are data-independent, so XLA's
    scheduler otherwise interleaves their relinearization transients; at
    bootstrap-EvalMod widths (stacked pair, l~90 at N=2^15) the ~12 Taylor
    multiplies held ~0.5-1 GB of keyswitch temps EACH and the program
    RESOURCE_EXHAUSTED the chip (round-4 enc10 autopsy — residents were
    only 5.7 GiB of the 15 GiB limit; the rest was scheduler-inflated
    workspace).  Each multiply saturates the VPU alone, so serializing
    costs no meaningful overlap.
    """
    true_targets: set[int] = set()
    conj_from: dict[int, int] = {}
    for k in targets:
        if k == 0:
            continue
        if mirror is not None and k > mirror // 2:
            conj_from[k] = mirror - k
            true_targets.add(mirror - k)
        else:
            true_targets.add(k)
    basis: dict[int, Ciphertext] = {1: ct}
    prev = None
    for k, a, b in power_schedule(true_targets):
        xa, xb = basis[a], basis[b]
        if serialize and prev is not None:
            import jax

            da, db, _ = jax.lax.optimization_barrier(
                (xa.data, xb.data, prev)
            )
            xa, xb = xa.with_data(da), xb.with_data(db)
        basis[k] = ctx.multiply(xa, xb, drop=drop)
        prev = basis[k].data
    for k, src in conj_from.items():
        basis[k] = ctx.conjugate(basis[src])
    return basis


def _choose_drop(
    ctx: CkksContext,
    l_work: int,
    delta_out: Fraction,
    s_max: Fraction,
    min_bits: int = MIN_COEFF_SCALE_BITS,
) -> tuple[int, Fraction]:
    """Smallest rescale count whose pre-rescale scale S_pre = delta_out *
    prod(dropped primes) gives every coefficient at least ``min_bits`` bits
    of scale."""
    need = Fraction(1 << min_bits)
    s_pre = delta_out
    for k in range(0, l_work - ctx.params.n_base):
        if s_pre / s_max >= need:
            return k, s_pre
        s_pre = s_pre * ctx.params.moduli[l_work - 1 - k]
    raise ValueError("not enough limbs left to encode LUT coefficients")


def eval_lut_2d(
    ctx: CkksContext,
    coeffs: np.ndarray,
    basis_x: list[Ciphertext | None],
    basis_y: list[Ciphertext | None],
    delta_out: Fraction | None = None,
    min_coeff_scale_bits: int = MIN_COEFF_SCALE_BITS,
) -> Ciphertext:
    """sum_{p,q} coeffs[p,q] * X_p * Y_q with X_0 = Y_0 = 1.

    basis_x[p] / basis_y[q] are 2-poly ciphertexts (None at index 0 for the
    identity).  Returns a relinearized ciphertext at exactly ``delta_out``
    (default: the context scale).  Univariate evaluation is the P=1 case —
    then no tensor products or key switches occur at all.
    """
    if delta_out is None:
        delta_out = ctx.default_scale()
    coeffs = np.asarray(coeffs, np.complex128)
    # Batched coefficient sets [B, P, Q]: evaluate B different LUTs over the
    # SAME power bases in one pass — scalar multiplies carry a [B] batch axis
    # (ctx.mul_scalar_batched) and the result is a [B, ...]-batched
    # ciphertext.  Power sets are unioned over the batch.
    batched = coeffs.ndim == 3
    if batched:
        B = coeffs.shape[0]
        P, Q = coeffs.shape[1:]
        nz = (np.abs(coeffs) > 1e-11).any(axis=0)
    else:
        P, Q = coeffs.shape
        nz = np.abs(coeffs) > 1e-11

    used = [
        basis_x[p] for p in range(P) if nz[p].any() and basis_x[p] is not None
    ] + [
        basis_y[q] for q in range(Q) if nz[:, q].any() and basis_y[q] is not None
    ]
    assert used, "constant-only LUT"
    l_work = min(c.n_limbs for c in used)

    def s_of(c: Ciphertext | None) -> Fraction:
        return Fraction(1) if c is None else c.scale

    s_max = max(
        s_of(basis_x[p]) * s_of(basis_y[q])
        for p in range(P)
        for q in range(Q)
        if nz[p, q]
    )
    n_drop, s_pre = _choose_drop(
        ctx, l_work, delta_out, s_max, min_coeff_scale_bits
    )

    def al(c: Ciphertext) -> Ciphertext:
        return ctx.drop_limbs(c, c.n_limbs - l_work)

    def cvec(p: int, q: int):
        """Coefficient(s) at (p, q): complex scalar, or [B] vector batched."""
        return coeffs[:, p, q] if batched else complex(coeffs[p, q])

    def mul_c(c: Ciphertext, v, s: Fraction) -> Ciphertext:
        if batched:
            return ctx.mul_scalar_batched(c, v, s)
        return ctx.mul_scalar(c, v, s)

    def add_c(c: Ciphertext, v) -> Ciphertext:
        if batched:
            return ctx.add_const_batched(c, v)
        return ctx.add_const(c, v)

    acc3: Ciphertext | None = None   # 3-poly tensor accumulation
    acc2: Ciphertext | None = None   # 2-poly scalar accumulation
    const_total = np.zeros(B, np.complex128) if batched else 0.0 + 0.0j

    def acc2_add(term: Ciphertext) -> None:
        nonlocal acc2
        acc2 = term if acc2 is None else ctx.add(acc2, term)

    for p in range(P):
        if not nz[p].any():
            continue
        xp = basis_x[p]
        row_qs = [q for q in range(Q) if nz[p, q]]
        if xp is None:
            # identity X: scalar-accumulate the Y powers directly
            for q in row_qs:
                if basis_y[q] is None:
                    const_total += cvec(p, q)
                else:
                    acc2_add(
                        mul_c(
                            al(basis_y[q]),
                            cvec(p, q),
                            s_pre / basis_y[q].scale,
                        )
                    )
            continue
        inner_qs = [q for q in row_qs if basis_y[q] is not None]
        has_c_p0 = nz[p, 0] and basis_y[0] is None
        c_p0 = cvec(p, 0) if has_c_p0 else (0.0 if not batched else None)
        if not inner_qs:
            # row is only the constant term: fold into the 2-poly side
            acc2_add(mul_c(al(xp), c_p0, s_pre / xp.scale))
            continue
        s_u = s_pre / xp.scale
        u: Ciphertext | None = None
        for q in inner_qs:
            term = mul_c(
                al(basis_y[q]), cvec(p, q), s_u / basis_y[q].scale
            )
            u = term if u is None else ctx.add(u, term)
        if has_c_p0:
            u = add_c(u, c_p0)
        t = ctx.tensor(al(xp), u)
        acc3 = t if acc3 is None else ctx.add(acc3, t)

    if acc3 is not None:
        res = ctx.relinearize(acc3)
        if acc2 is not None:
            res = ctx.add(res, acc2)
    else:
        res = acc2
    if (np.abs(const_total).max() if batched else abs(const_total)) > 0:
        res = add_c(res, const_total)
    res = ctx.rescale(res, n_drop)
    assert res.scale == delta_out, (res.scale, delta_out)
    return res
