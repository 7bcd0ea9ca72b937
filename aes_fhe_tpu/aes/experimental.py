"""Experimental AES-op variants — TPU-native equivalents of the reference's
``temp/`` modules (SURVEY.md C23-C25), with measured conclusions.

C23 — byte-domain MixColumns (reference: temp/mix_columns_enc.py).  Implemented
here as :class:`MixColumnsByteDomain`: recombine each nibble pair into a
zeta256 byte ciphertext, evaluate the composed GF-multiplier-and-split LUTs
(a single degree-255 dual-polynomial pass per multiplier — the reference ran
gf-mult and 256->16 split as separate stages, :64-72 and :158-179), align
columns by rotating the single byte ciphertext (half the rotation count of
the nibble pair), then XOR4-fold.  Conclusion (mirroring why the reference
left its variant in temp/): the XOR4 fold dominates either way, and the
byte-domain chain consumes 44 levels vs 27 for the 16x16 bivariate path
(measured at logn=8, dnum=3), so
:class:`aes_fhe_tpu.aes.ops.MixColumns` remains the production op.

C24 — rotate->XOR drift forensics (reference: temp/mixcolumns_desilo_port.py)
live as property tests in tests/test_forensics.py: xor(a, a) == 0, operand
symmetry, rotation-pair XOR — all *pass* on this engine because the XOR
coefficients are unit-normalized (quirk Q2 fixed) and scales are tracked
exactly.

C25 — fused ShiftRows+MixColumns (reference: temp/shiftrows_mixcolumns_fused.py)
is analyzed rather than shipped: with hoisted rotations,
rot_k(SR(x)) = sum_d rot_k(mask_d) * rot_{d+4k*stride}(x) needs the 18
distinct rotations {d + 4k*stride} under ONE hoisted decomposition versus
9 rotations under two decompositions for the unfused pair.  A marginal
hoisted rotation costs an inner product + mod-down (~2/5 of a full key
switch), so the fusion trades ~(D + 9*r_m) extra marginal rotations for one
saved decomposition D — strictly worse whenever r_m > D/9, which holds on
this engine (measured r_m ~ 2-3 ms vs D ~ 4 ms at L=64).  The reference's
byte-domain '4 squarings' split trick is subsumed by split256_coeffs()
(split_lo is literally the monomial x^16).
"""

from __future__ import annotations

import numpy as np

from ..ckks.context import CkksContext
from . import luts
from .ops import CtPair, SubBytes, Xor4

__all__ = ["MixColumnsByteDomain"]


class MixColumnsByteDomain:
    """MixColumns via zeta256 byte-domain GF multipliers (reference C23).

    b_out = 2*a XOR 3*rot1(a) XOR rot2(a) XOR rot3(a), where 2*a and
    3*rot1(a) are evaluated as byte->(nibble,nibble) degree-255 LUT pairs on
    the recombined byte ciphertext, and rot2/rot3 stay in the nibble domain
    (identity split).  Exact on the codebook; slower than ops.MixColumns
    (see module docstring) but exercises the byte-domain machinery the
    GHS12-style pipeline needs."""

    def __init__(
        self,
        ctx: CkksContext,
        xor4: Xor4,
        stride: int,
        use_jit: bool = False,
    ):
        self.ctx = ctx
        self.xor4 = xor4
        self.stride = stride
        self.gf2 = SubBytes(
            ctx, use_jit=use_jit, coeffs=luts.gf_mult_byte_split_coeffs(2)
        )
        self.gf3 = SubBytes(
            ctx, use_jit=use_jit, coeffs=luts.gf_mult_byte_split_coeffs(3)
        )

    def __call__(self, state: CtPair) -> CtPair:
        ctx = self.ctx
        s = self.stride
        # nibble-domain alignment for the identity terms (k = 2, 3)
        r23_hi = ctx.rotate_many(state[0], [-8 * s, -12 * s])
        r23_lo = ctx.rotate_many(state[1], [-8 * s, -12 * s])
        r2 = (r23_hi[0], r23_lo[0])
        r3 = (r23_hi[1], r23_lo[1])
        # byte-domain multipliers: 2*(orig), 3*(rot1).  SubBytes.__call__
        # recombines hi*lift(lo) internally, so rot1 alignment happens on the
        # *nibble* pair first (the byte ciphertext only exists inside).
        r1 = (ctx.rotate(state[0], -4 * s), ctx.rotate(state[1], -4 * s))
        t2 = self.gf2(*state)
        t3 = self.gf3(*r1)
        left = self.xor4.pair(t2, t3)
        right = self.xor4.pair(r2, r3)
        return self.xor4.pair(left, right)
