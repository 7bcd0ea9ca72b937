"""Homomorphic DFT: SlotToCoeff / CoeffToSlot stage machinery.

The canonical-embedding decode map E (coefficients -> slot values, see
ckks/encoder.py) factors radix-2 through the even/odd split
m(x) = m_e(x^2) + x*m_o(x^2).  Because the slot points are the generator-5
orbit e_j = 5^j mod 2N, each level of the recursion is *self-similar*
(5^j mod N is again the generator-5 orbit) and, with the sub-transform
layouts [evens | odds], each level is a tiled butterfly coupling slot halves
at distance r through a single twiddle vector:

    out[b*2r + j]     = in[..j]   + tw[j] * in[..j+r]
    out[b*2r + j + r] = in[..j]   - tw[j] * in[..j+r]
    tw[j] = omega^{2^t * (5^j mod 2N/2^t)}

i.e. THREE diagonals and TWO global rotations (+-r) per stage — the classic
"special FFT" structure, derived here directly against this engine's encoder
convention and validated numerically in tests.

The recursion's leaves pack coefficient pairs as z[s] = c_A[s] - i*c_B[s]
(x^{N/2} evaluates to -i), which is exactly the full-slot bootstrap packing:
CoeffToSlot = inverse stages -> conjugation split into two real vectors;
SlotToCoeff = forward stages on t0 - i*t1.

Stages are composed symbolically (diag x rotation algebra) into radix-2^g
groups to trade key switches against multiplicative depth.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import numpy as np

from .context import CkksContext
from .types import Ciphertext, Plaintext

__all__ = [
    "leaf_map",
    "s2c_stage_ops",
    "c2s_stage_ops",
    "merge_stage_ops",
    "stage_offsets",
    "HomDft",
]

StageOp = dict[int, np.ndarray]  # rotation offset -> weight vector [n]


def leaf_map(big_n: int) -> tuple[np.ndarray, np.ndarray]:
    """Leaf packing indices: slot s holds c_A[s] - i * c_B[s]."""

    def rec(indices: list[int]) -> list[tuple[int, int]]:
        if len(indices) == 2:
            return [(indices[0], indices[1])]
        return rec(indices[0::2]) + rec(indices[1::2])

    pairs = rec(list(range(big_n)))
    a = np.array([p[0] for p in pairs])
    b = np.array([p[1] for p in pairs])
    return a, b


def _stage_twiddle(big_n: int, t: int) -> np.ndarray:
    """tw[j] = omega^{2^t * e_j^{(t)}}, j < n/2^{t+1}, omega = exp(-2pi i/2N)."""
    n = big_n // 2
    two_n_t = 2 * big_n // (1 << t)
    r = n >> (t + 1)
    e = 1
    tw = np.empty(r, np.complex128)
    omega_t = np.exp(-2j * np.pi * (1 << t) / (2 * big_n))
    for j in range(r):
        tw[j] = omega_t**e
        e = (e * 5) % two_n_t
    return tw


def s2c_stage_ops(big_n: int) -> list[StageOp]:
    """SlotToCoeff (forward E) stages in application order (innermost
    butterfly first).  Each op maps v -> sum_d w_d * roll(v, d)."""
    n = big_n // 2
    logn = n.bit_length() - 1
    ops: list[StageOp] = []
    for t in range(logn - 1, -1, -1):  # innermost (smallest blocks) first
        r = n >> (t + 1)
        tw = _stage_twiddle(big_n, t)
        blocks = 1 << t
        d_a = np.empty(n, np.complex128)
        d_b = np.zeros(n, np.complex128)
        d_c = np.zeros(n, np.complex128)
        for b in range(blocks):
            o = b * 2 * r
            d_a[o : o + r] = 1.0
            d_a[o + r : o + 2 * r] = -tw
            d_b[o : o + r] = tw
            d_c[o + r : o + 2 * r] = 1.0
        if 2 * r == n:  # outermost stage: +-r coincide mod n
            ops.append({0: d_a, (-r) % n: d_b + d_c})
        else:
            ops.append({0: d_a, (-r) % n: d_b, r: d_c})
    return ops


def c2s_stage_ops(big_n: int) -> list[StageOp]:
    """CoeffToSlot (E^{-1}) stages in application order (outermost inverse
    butterfly first)."""
    n = big_n // 2
    logn = n.bit_length() - 1
    ops: list[StageOp] = []
    for t in range(0, logn):  # outermost first (inverse order)
        r = n >> (t + 1)
        tw = _stage_twiddle(big_n, t)
        blocks = 1 << t
        d_a = np.empty(n, np.complex128)
        d_b = np.zeros(n, np.complex128)
        d_c = np.zeros(n, np.complex128)
        for b in range(blocks):
            o = b * 2 * r
            d_a[o : o + r] = 0.5
            d_a[o + r : o + 2 * r] = -0.5 / tw
            d_b[o : o + r] = 0.5
            d_c[o + r : o + 2 * r] = 0.5 / tw
        if 2 * r == n:
            ops.append({0: d_a, (-r) % n: d_b + d_c})
        else:
            ops.append({0: d_a, (-r) % n: d_b, r: d_c})
    return ops


def apply_stage_np(v: np.ndarray, op: StageOp) -> np.ndarray:
    out = np.zeros_like(v)
    for d, w in op.items():
        out += w * np.roll(v, d)
    return out


def merge_stage_ops(ops: list[StageOp], group: int) -> list[StageOp]:
    """Compose consecutive stages symbolically:
    (D_{w2} R_{d2})(D_{w1} R_{d1}) = D_{w2 * roll(w1, d2)} R_{d1+d2}."""
    merged: list[StageOp] = []
    for i in range(0, len(ops), group):
        acc: StageOp | None = None
        for op in ops[i : i + group]:  # application order
            if acc is None:
                acc = dict(op)
                continue
            new: StageOp = {}
            n = len(next(iter(acc.values())))
            for d2, w2 in op.items():
                for d1, w1 in acc.items():
                    d = (d1 + d2) % n
                    w = w2 * np.roll(w1, d2)
                    if d in new:
                        new[d] = new[d] + w
                    else:
                        new[d] = w
            acc = new
        merged.append(acc)
    return merged


def stage_offsets(ops: list[StageOp], n: int) -> set[int]:
    """Signed rotation amounts (slot semantics) the ops need."""
    out = set()
    for op in ops:
        for d in op:
            if d != 0:
                # roll by d == rotate(ct, d) in our slot convention
                out.add(d if d <= n // 2 else d - n)
    return out


class HomDft:
    """Homomorphic application of merged DFT stages.

    Each merged stage: out = sum_d diag_d * rotate(ct, d), one plaintext
    multiply level.  Diagonal plaintexts are encoded lazily per (stage,
    limb-count) and cached.
    """

    def __init__(
        self,
        ctx: CkksContext,
        ops: list[StageOp],
        diag_scale_bits: int = 29,
    ):
        self.ctx = ctx
        self.ops = ops
        self.n = ctx.params.n_slots
        self.diag_scale = Fraction(1 << diag_scale_bits)
        self._pt_cache: dict[tuple[int, int, int], Plaintext] = {}

    def required_rotations(self) -> set[int]:
        return stage_offsets(self.ops, self.n)

    def _diag_pt(self, stage: int, d: int, limbs: int) -> Plaintext:
        key = (stage, d, limbs)
        if key not in self._pt_cache:
            w = self.ops[stage][d]
            self._pt_cache[key] = self.ctx.encode_plain(
                w, self.diag_scale, limbs
            )
        # numpy-backed if first encoded mid-trace; upgrade when legal
        self._pt_cache[key] = self.ctx.plain_device(self._pt_cache[key])
        return self._pt_cache[key]

    def __call__(self, ct: Ciphertext) -> Ciphertext:
        """Each merged stage is ONE fused kernel: all of its rotations share
        a hoisted gadget decomposition and the diagonal multiplies/
        accumulation/rescale fuse (ctx.rotate_mul_accum) — the stage count,
        not the diagonal count, sets the dispatch cost."""
        ctx = self.ctx
        for si, op in enumerate(self.ops):
            ds = sorted(op)
            pts = [self._diag_pt(si, d, ct.n_limbs) for d in ds]
            ct = ctx.rotate_mul_accum(ct, ds, pts)
        return ct
