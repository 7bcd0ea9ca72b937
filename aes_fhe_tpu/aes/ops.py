"""Homomorphic AES round operations over packed zeta16 nibble ciphertexts.

Parity targets (reference): XOR4LUT (xor4_lut.py), AddRoundKey
(add_round_key.py), SubBytesLUTFastCached (sub_bytes_lut.py), ShiftRows /
InvShiftRows (shift_rows.py, inv_shiftrows.py), MixColFinal (mixcol_final.py),
InvMixColumnsFHE (invmixcolumns_fhe.py), Zeta16 snap (zeta16_noise_reducter.py,
noise_reduction.py).

Slot layout: *row-major* — state byte (r, c) lives at slot block
(4r + c) * stride.  This differs deliberately from the reference's
column-first ShiftRows packing (shift_rows.py:25-37): with a row-major
layout, MixColumns' within-column neighbor alignment a_{r+k,c} is a single
global rotation by -4k*stride (index mod 4 — the column — is preserved under
rotation of the 16-block cycle), so MixColumns needs NO masks and burns no
scale levels on masking.  The reference's own MixColumns module silently
assumed this row-major view (mixcol_final.py:101-102, 169-221) while its
ShiftRows assumed column-first — an inconsistency this build resolves by
fixing row-major in slot space and handling the byte<->slot transpose for
free in the host-side StateEncoder packing.

ShiftRows then needs two masked rotations per row (rows 1-3) since rows are
contiguous 4-blocks; total 7 block masks + 6 rotations per ciphertext.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from ..ckks.context import CkksContext
from ..ckks.types import Ciphertext, Plaintext, stack_cts, unstack_cts
from . import luts
from .lut_eval import build_power_basis, eval_lut_2d

__all__ = [
    "CtPair",
    "Xor4",
    "AddRoundKey",
    "SubBytes",
    "ShiftRows",
    "MixColumns",
    "InvMixColumns",
    "Snap",
    "MagDamp",
    "SnapNoMul",
    "NoiseReducer",
    "Snap1D",
    "rotation_steps_required",
]

CtPair = tuple[Ciphertext, Ciphertext]


def rotation_steps_required(stride: int) -> list[int]:
    """Every slot-rotation amount the AES ops use (for Galois keygen)."""
    s = stride
    return [-s, -2 * s, -3 * s, s, 2 * s, 3 * s, -4 * s, -8 * s, -12 * s]


def _nz_axes(coeffs: np.ndarray) -> tuple[set[int], set[int]]:
    nz = np.abs(coeffs) > 1e-11
    return (
        {p for p in range(coeffs.shape[0]) if nz[p].any() and p > 0},
        {q for q in range(coeffs.shape[1]) if nz[:, q].any() and q > 0},
    )


def _basis_list(basis: dict[int, Ciphertext], size: int) -> list:
    return [None] + [basis.get(k) for k in range(1, size)]


class Xor4:
    """4-bit XOR via the 64-term bivariate LUT (reference: xor4_lut.py).

    Only odd powers appear in the coefficient set, so each operand basis is 4
    multiplies + 4 conjugations; the 64 terms collapse to 8 lazy tensor
    products and ONE relinearization (vs 64 relinearizing multiplies in the
    reference hot loop, xor4_lut.py:71-73).

    With ``use_jit`` the whole evaluation compiles into one XLA program per
    input signature (keys/tables as arguments via ctx.jit_fn) — dispatch
    overhead dominated the eager TPU path by ~5x."""

    def __init__(self, ctx: CkksContext, use_jit: bool = False):
        self.ctx = ctx
        self.coeffs = luts.xor4_coeffs()
        self.need_p, self.need_q = _nz_axes(self.coeffs)
        self._fwd = ctx.jit_fn(self._forward) if use_jit else self._forward

    def _forward(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        bx = build_power_basis(self.ctx, a, self.need_p, mirror=16)
        by = build_power_basis(self.ctx, b, self.need_q, mirror=16)
        return eval_lut_2d(
            self.ctx, self.coeffs, _basis_list(bx, 16), _basis_list(by, 16)
        )

    def __call__(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        return self._fwd(a, b)

    def pair(self, x: CtPair, y: CtPair) -> CtPair:
        """XOR both nibbles of a state pair: hi/lo stacked on a leading batch
        axis so the whole LUT evaluation runs once on doubled data (the
        coefficients are identical for both nibbles)."""
        try:
            a = stack_cts(self.ctx.align(x[0], x[1]))
            b = stack_cts(self.ctx.align(y[0], y[1]))
        except AssertionError:
            return self(x[0], y[0]), self(x[1], y[1])
        out = self(a, b)
        o0, o1 = unstack_cts(out)
        return o0, o1


class AddRoundKey:
    """state XOR roundkey, nibble-wise (reference: add_round_key.py:138-144)."""

    def __init__(self, xor4: Xor4):
        self.xor4 = xor4

    def __call__(self, state: CtPair, key: CtPair) -> CtPair:
        return self.xor4.pair(state, key)


class SubBytes:
    """8->(4,4) S-box via baby-step/giant-step dual polynomial evaluation.

    Pipeline (reference: sub_bytes_lut.py:46-73, redesigned):
      1. lift lo nibble zeta16 -> zeta256 (pure scalar sum over a deg-8
         basis: no key switch beyond the basis itself);
      2. recombine byte ct_b = ct_hi * lift(ct_lo);
      3. ONE shared baby (x^1..x^15) + giant (x^16j, j<=8) basis;
      4. four BSGS accumulations (hi/lo x low/high-half), high halves
         folded through conjugation: P(x) = R(x) + conj(Q(x)) with
         Q(y) = sum conj(c_{256-j}) y^j  (|x| = 1 on the codebook).
    ~45 key switches total vs ~150 in the reference's 128-power-basis loop.
    """

    def __init__(
        self,
        ctx: CkksContext,
        inverse: bool = False,
        use_jit: bool = False,
        coeffs: tuple[np.ndarray, np.ndarray] | None = None,
    ):
        """``coeffs`` overrides the dual degree-255 polynomials (hi, lo),
        turning this into a generic byte -> (nibble, nibble) LUT evaluator
        (used by aes/experimental.py for byte-domain GF multipliers)."""
        self.ctx = ctx
        hi, lo = luts.sbox_coeffs(inverse) if coeffs is None else coeffs
        self.low_hi, self.high_hi = self._split(hi)
        self.low_lo, self.high_lo = self._split(lo)
        self.lift = luts.lift16_to_256_coeffs().reshape(1, 16)
        self.lift_need = {
            q for q in range(1, 16) if abs(self.lift[0, q]) > 1e-11
        }
        # jitted in two halves: the basis build and the BSGS accumulations
        # each compile standalone (one program covering both exceeds the
        # remote TPU compiler's size limit in this environment)
        if use_jit:
            self._basis_fn = ctx.jit_fn(self._build_basis)
            self._accum_fn = ctx.jit_fn(self._accumulate)
        else:
            self._basis_fn = self._build_basis
            self._accum_fn = self._accumulate

    @staticmethod
    def _split(c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Degree-255 coeffs -> (low [9,16] for x^0..x^128,
        high [8,16] for conj-folded x^129..x^255 as Q(y), y-deg 1..127)."""
        low = np.zeros((9, 16), np.complex128)
        for k in range(129):
            low[k // 16, k % 16] = c[k]
        high = np.zeros((8, 16), np.complex128)
        for k in range(129, 256):
            j = 256 - k  # 1..127
            high[j // 16, j % 16] = np.conj(c[k])
        return low, high

    def __call__(self, ct_hi: Ciphertext, ct_lo: Ciphertext) -> CtPair:
        basis = self._basis_fn(ct_hi, ct_lo)
        return self._accum_fn(basis)

    def _build_basis(
        self, ct_hi: Ciphertext, ct_lo: Ciphertext
    ) -> dict[int, Ciphertext]:
        ctx = self.ctx
        ws, wdrop = ctx.ladder()
        # 1) lift: univariate scalar sum (P=1 row in the generic evaluator).
        # On depth-diet chains the lift ladder runs at the elevated tier
        # too: its output error feeds ct_b and the byte ladder amplifies
        # ct_b error ~x128 through the giants.
        lo = ct_lo if ct_lo.scale == ws else ctx.to_scale(ct_lo, ws)
        lb = build_power_basis(ctx, lo, self.lift_need, mirror=16, drop=wdrop)
        lifted = eval_lut_2d(
            ctx, self.lift, [None], _basis_list(lb, 16), delta_out=ws
        )
        # 2) recombine to the byte codeword zeta256^b (at the ladder tier)
        hi = ct_hi if ct_hi.scale == ws else ctx.to_scale(ct_hi, ws)
        ct_b = ctx.multiply(hi, lifted, drop=wdrop)
        # 3) shared babies + giants
        targets = set(range(2, 16)) | {16 * j for j in range(1, 9)}
        return build_power_basis(ctx, ct_b, targets, drop=wdrop)

    def _accumulate(self, basis: dict[int, Ciphertext]) -> CtPair:
        ctx = self.ctx
        giants = [None] + [basis[16 * j] for j in range(1, 9)]
        babies = _basis_list(basis, 16)
        # 4) both dual-poly accumulations ride the shared basis as ONE
        # batched evaluation each (hi/lo stacked coefficients), and the two
        # conj-folded high halves share a single conjugation key switch
        r = eval_lut_2d(
            ctx, np.stack([self.low_hi, self.low_lo]), giants, babies
        )
        q = eval_lut_2d(
            ctx, np.stack([self.high_hi, self.high_lo]), giants, babies
        )
        out = unstack_cts(ctx.add(r, ctx.conjugate(q)))
        return out[0], out[1]


class ShiftRows:
    """Row r rotated left by r (right for the inverse), row-major layout.

    Rows are contiguous 4-blocks, so each row needs two masked global
    rotations (split at the wrap point); row 0 contributes a masked identity.
    Masks are stride-wide (block-batch safe — the reference's single-slot
    masks, shift_rows.py:27-33, only handled one block per stride).

    TPU-first formulation: rot(m * ct) = rot(m) * rot(ct) (the automorphism
    is a ring map), so masks are applied *after* rotation on destination
    slots and every rotation acts on the SAME ciphertext — all six rotations
    share one hoisted gadget decomposition (ctx.rotate_many)."""

    def __init__(
        self,
        ctx: CkksContext,
        stride: int,
        inverse: bool = False,
        use_jit: bool = False,
    ):
        self.ctx = ctx
        self.stride = stride
        n_slots = ctx.params.n_slots
        full_limbs = ctx.params.n_limbs

        def block_mask(slot_indices: list[int]) -> np.ndarray:
            m = np.zeros(n_slots, np.complex128)
            for i in slot_indices:
                m[i * stride : (i + 1) * stride] = 1.0
            return m

        # delta -> destination-slot index list
        dest: dict[int, list[int]] = {}
        for r in range(4):
            shift = (-r) % 4 if inverse else r
            if shift == 0:
                dest.setdefault(0, []).extend(4 * r + c for c in range(4))
                continue
            # branch A: dest columns [0, 4-shift) via rotation -shift
            dest.setdefault(-shift * stride, []).extend(
                4 * r + c for c in range(4 - shift)
            )
            # branch B: wrap, dest columns [4-shift, 4) via +(4-shift)
            dest.setdefault((4 - shift) * stride, []).extend(
                4 * r + c for c in range(4 - shift, 4)
            )
        self.deltas = sorted(d for d in dest if d != 0)
        self._mask_vals = {d: block_mask(idx) for d, idx in dest.items()}
        # Masks are encoded lazily at scale EXACTLY q_{l-1} (the prime the
        # following rescale drops), so ShiftRows preserves the input scale
        # bit-exactly — keeping every AES op's inputs at the working scale,
        # which is what lets the MixColumns XOR tree batch its operands.
        self._mask_cache: dict[int, dict[int, Plaintext]] = {}
        self._one = ctx.jit_fn(self._one_impl) if use_jit else self._one_impl

    def _masks_for(self, l: int) -> dict[int, Plaintext]:
        if l not in self._mask_cache:
            s = Fraction(self.ctx.params.moduli[l - 1])
            self._mask_cache[l] = {
                d: self.ctx.encode_plain(v, s, l)
                for d, v in self._mask_vals.items()
            }
        # upgrade numpy-backed entries to device arrays when legal (encoding
        # may first happen mid-trace, where device_put would leak tracers)
        self._mask_cache[l] = {
            d: self.ctx.plain_device(pt)
            for d, pt in self._mask_cache[l].items()
        }
        return self._mask_cache[l]

    def one(self, ct: Ciphertext) -> Ciphertext:
        return self._one(ct)

    def _one_impl(self, ct: Ciphertext) -> Ciphertext:
        masks = self._masks_for(ct.n_limbs)
        ds = [0] + self.deltas
        return self.ctx.rotate_mul_accum(ct, ds, [masks[d] for d in ds])

    def __call__(self, state: CtPair) -> CtPair:
        """Both nibbles stacked: one rotation/mask pass on doubled data."""
        out = self.one(stack_cts(self.ctx.align(*state)))
        o0, o1 = unstack_cts(out)
        return o0, o1


class _GfMixBase:
    """Shared machinery: rotation alignment + GF-mult bivariate LUTs + XOR
    accumulation tree."""

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
        self._gf_jit: dict[int, object] = {}
        self.use_jit = use_jit

    def _rots(self, state: CtPair) -> list[CtPair]:
        """[rot1, rot2, rot3]: align a_{r+k,c} onto (r,c) for k=1..3 —
        global rotations by -4k*stride, hoisted (one shared gadget
        decomposition for all three rotations of the stacked hi/lo pair)."""
        ds = [-4 * k * self.stride for k in (1, 2, 3)]
        st = stack_cts(self.ctx.align(*state))
        rots = self.ctx.rotate_many(st, ds)
        return [tuple(unstack_cts(r)) for r in rots]

    def _gf_mult(self, state: CtPair, k: int) -> CtPair:
        if self.use_jit:
            if k not in self._gf_jit:
                import functools

                self._gf_jit[k] = self.ctx.jit_fn(
                    functools.partial(self._gf_mult_impl, k=k)
                )
            return self._gf_jit[k](state)
        return self._gf_mult_impl(state, k)

    def _gf_mult_impl(self, state: CtPair, k: int) -> CtPair:
        hi_c, lo_c = luts.gf_mult_coeffs(k)
        need_p = _nz_axes(hi_c)[0] | _nz_axes(lo_c)[0]
        need_q = _nz_axes(hi_c)[1] | _nz_axes(lo_c)[1]
        bx = build_power_basis(self.ctx, state[0], need_p, mirror=16)
        by = build_power_basis(self.ctx, state[1], need_q, mirror=16)
        bxl, byl = _basis_list(bx, 16), _basis_list(by, 16)
        out = unstack_cts(
            eval_lut_2d(self.ctx, np.stack([hi_c, lo_c]), bxl, byl)
        )
        return out[0], out[1]

    def _gf_mults(self, states: list[CtPair], ks: list[int]) -> list[CtPair]:
        """GF-constant multipliers for several (state, k) pairs at once.

        All states share scale/limbs (they are rotations of one state), so
        the hi operands stack into one batched ciphertext (likewise lo) and
        the 2*len(ks) coefficient sets ride the SAME two power bases as one
        batched LUT evaluation — e.g. InvMixColumns' 8 bivariate evals
        (reference: invmixcolumns_fhe.py:131-170) collapse to 2 basis builds
        + 1 batched accumulation."""
        if self.use_jit:
            key = ("multi", tuple(ks))
            if key not in self._gf_jit:
                import functools

                self._gf_jit[key] = self.ctx.jit_fn(
                    functools.partial(self._gf_mults_impl, ks=list(ks))
                )
            return self._gf_jit[key](states)
        return self._gf_mults_impl(states, ks)

    def _gf_mults_impl(
        self, states: list[CtPair], ks: list[int]
    ) -> list[CtPair]:
        ctx = self.ctx
        coeff_sets = []
        for k in ks:
            hi_c, lo_c = luts.gf_mult_coeffs(k)
            coeff_sets += [hi_c, lo_c]
        coeffs = np.stack(coeff_sets)  # [2*B, 16, 16]
        need_p = set().union(*(_nz_axes(c)[0] for c in coeff_sets))
        need_q = set().union(*(_nz_axes(c)[1] for c in coeff_sets))
        # interleave per-k batch entries: X operand for entry (2i) is
        # states[i].hi, for (2i+1) is states[i].lo? No — every coefficient
        # set takes (hi, lo) of ITS state: X basis from hi, Y from lo.
        his = stack_cts([s[0] for s in states])  # [B, ...]
        los = stack_cts([s[1] for s in states])
        bx = build_power_basis(ctx, his, need_p, mirror=16)
        by = build_power_basis(ctx, los, need_q, mirror=16)
        # batch layout: coefficient entry 2i+j must pair with state i.  The
        # bases are [B, ...]; expand each to [2B, ...] by repeating along the
        # batch so entry 2i+j sees state i's powers.
        def rep(c: Ciphertext | None) -> Ciphertext | None:
            if c is None:
                return None
            return c.with_data(
                jnp.repeat(c.data, 2, axis=0)
            )
        bxl = [rep(c) for c in _basis_list(bx, 16)]
        byl = [rep(c) for c in _basis_list(by, 16)]
        out = unstack_cts(eval_lut_2d(ctx, coeffs, bxl, byl))
        return [(out[2 * i], out[2 * i + 1]) for i in range(len(ks))]


class MixColumns(_GfMixBase):
    """b = 2a XOR 3*rot1(a) XOR rot2(a) XOR rot3(a) — the diagonal
    decomposition (reference: mixcol_final.py:112-165, README.md:26-27), with
    a balanced XOR tree (depth 2 instead of the reference's sequential
    chain).  The two GF LUTs and each XOR level run as single batched
    evaluations."""

    def __call__(self, state: CtPair) -> CtPair:
        r1, r2, r3 = self._rots(state)
        t2, t3 = self._gf_mults([state, r1], [2, 3])
        left = self.xor4.pair(t2, t3)
        right = self.xor4.pair(r2, r3)
        return self.xor4.pair(left, right)


class InvMixColumns(_GfMixBase):
    """b = 14a XOR 11*rot1 XOR 13*rot2 XOR 9*rot3 (reference:
    invmixcolumns_fhe.py:131-170).  Present and *wired into decryption* —
    the reference's committed decrypt dropped it (SURVEY.md quirk Q1).
    All 8 GF LUT evaluations batch into one pass; the XOR tree batches
    4-wide then 2-wide."""

    def __call__(self, state: CtPair) -> CtPair:
        r1, r2, r3 = self._rots(state)
        t14, t11, t13, t9 = self._gf_mults(
            [state, r1, r2, r3], [14, 11, 13, 9]
        )
        left = self.xor4.pair(t14, t11)
        right = self.xor4.pair(t13, t9)
        return self.xor4.pair(left, right)


class Snap:
    """Zeta16 codeword re-anchoring: f(x) = (1 + 1/16)x - (1/16)x^17.

    The contractive map of the reference's NoiseReducer family
    (noise_reduction.py:22-28, zeta16_noise_reducter.py) with exact
    closed-form coefficients (no ill-conditioned LS fit — SURVEY.md C21).
    Quadratic error contraction in both phase and magnitude at every 16th
    root of unity.  Pure polynomial — no secret key involved (unlike the
    reference's hard renorm, quirk Q4)."""

    def __init__(self, ctx: CkksContext, use_jit: bool = False):
        self.ctx = ctx
        self._one = ctx.jit_fn(self._one_impl) if use_jit else self._one_impl

    def one(self, ct: Ciphertext) -> Ciphertext:
        return self._one(ct)

    def _one_impl(self, ct: Ciphertext) -> Ciphertext:
        ctx = self.ctx
        # the x^16 squaring chain runs at the elevated ladder tier on
        # depth-diet chains (ctx.ladder) — at the bare chain scale its own
        # relin noise (~2^-19 relative, doubling per squaring) would defeat
        # the quadratic contraction the snap exists to provide
        ws, wdrop = ctx.ladder()
        w = ct if ct.scale == ws else ctx.to_scale(ct, ws)
        basis = build_power_basis(ctx, w, {16}, drop=wdrop)
        x17 = ctx.multiply(basis[16], w, drop=wdrop)
        coeffs = np.zeros((1, 18), np.complex128)
        coeffs[0, 1] = 17.0 / 16.0
        coeffs[0, 17] = -1.0 / 16.0
        by = [None] + [basis.get(k) for k in range(1, 17)] + [x17]
        return eval_lut_2d(ctx, coeffs, [None], by)

    def pair(self, state: CtPair) -> CtPair:
        out = self.one(stack_cts(self.ctx.align(*state)))
        o0, o1 = unstack_cts(out)
        return o0, o1


class MagDamp:
    """Bounded magnitude damper: g(x) = x * p(x * conj(x)).

    The snap polynomial is UNBOUNDED: (1/16)|x|^17 diverges for
    |x| > 16^(1/16) ~ 1.19, so a slot that leaves a LUT ladder
    off-codebook (|P(z)| up to the coefficient L1 norm, ~3.5 measured at
    the S-box, 14.6 worst-case) explodes through the next stabilize and
    — once powers push |z| * scale past Q — wraps the RNS representation
    and corrupts EVERY slot (the round-5 enc.r2.mc cliff, DESIGN.md
    §22-23).  g is the closed-loop safety net: p is a cubic in m = |x|^2
    constrained by p(1) = 1, p'(1) = -1/2 (so |g| has a critical point at
    the unit circle: codeword magnitudes are preserved to O(delta^2)) and
    fitted so max |sqrt(m) p(m)| <= 1.0 over m <= 16.5 — every input with
    |x| <= 4.06 maps INSIDE the unit disk, phases untouched.  A wrong
    slot stays wrong-but-bounded (the reference's hard-renorm behavior)
    instead of detonating the ciphertext.  Cost: 4 ct*ct multiplies.

    Fit (round-5): c2 = 0.059, c3 = -0.002 gives peak 0.99999994 on
    m in [0, 16.5]; codeword |g| at delta = 0.01 is 0.99988."""

    C2, C3 = 0.059, -0.002

    def __init__(self, ctx: CkksContext, use_jit: bool = False):
        self.ctx = ctx
        self._one = ctx.jit_fn(self._one_impl) if use_jit else self._one_impl

    def one(self, ct: Ciphertext) -> Ciphertext:
        return self._one(ct)

    def _one_impl(self, ct: Ciphertext) -> Ciphertext:
        ctx = self.ctx
        ws, wdrop = ctx.ladder()
        x = ct if ct.scale == ws else ctx.to_scale(ct, ws)
        m = ctx.multiply(x, ctx.conjugate(x), drop=wdrop)   # |x|^2 (real)
        m2 = ctx.multiply(m, m, drop=wdrop)
        m3 = ctx.multiply(m2, m, drop=wdrop)
        # p(m) = 1 - (m-1)/2 + C2 (m-1)^2 + C3 (m-1)^3, expanded in m
        c2, c3 = self.C2, self.C3
        a0 = 1.0 + 0.5 + c2 - c3
        a1 = -0.5 - 2.0 * c2 + 3.0 * c3
        a2 = c2 - 3.0 * c3
        a3 = c3
        coeffs = np.zeros((1, 4), np.complex128)
        coeffs[0, 0] = a0
        coeffs[0, 1] = a1
        coeffs[0, 2] = a2
        coeffs[0, 3] = a3
        l = min(x.n_limbs, m3.n_limbs)
        by = [None, ctx.drop_limbs(m, m.n_limbs - l),
              ctx.drop_limbs(m2, m2.n_limbs - l), m3]
        s = eval_lut_2d(ctx, coeffs, [None], by, delta_out=ws)
        xa, sa = ctx.align(x, s)
        return ctx.multiply(xa, sa, drop=wdrop)

    def pair(self, state: CtPair) -> CtPair:
        out = self.one(stack_cts(self.ctx.align(*state)))
        o0, o1 = unstack_cts(out)
        return o0, o1


class SnapNoMul:
    """Reference-parity snap variant: f(x) = (9/8)x + (1/8)x^9 with
    x^9 = conj(x^7) (reference: Zeta16SnapNoMul,
    zeta16_noise_reducter.py:64-105 — "no mul" = no ct x ct beyond the
    power basis; the x^16 * x step of the full Snap is avoided).

    Honest characterization (the reference never documented this): on the
    codebook f(zeta^v) = zeta^v * (9 + (-1)^v)/8 — phase-EXACT everywhere
    (so the phase-only decode stays exact) but magnitude inflates to 1.25 on
    even codewords, and phase noise contracts to first order only on odd
    codewords (amplified ~1.8x on even ones).  Kept for parity and for
    odd-nibble-heavy traffic; ``Snap`` is the correct general-purpose map."""

    def __init__(self, ctx: CkksContext, use_jit: bool = False):
        self.ctx = ctx
        self._one = ctx.jit_fn(self._one_impl) if use_jit else self._one_impl

    def one(self, ct: Ciphertext) -> Ciphertext:
        return self._one(ct)

    def _one_impl(self, ct: Ciphertext) -> Ciphertext:
        ctx = self.ctx
        basis = build_power_basis(ctx, ct, {9}, mirror=16)  # x^9 = conj(x^7)
        coeffs = np.zeros((1, 10), np.complex128)
        coeffs[0, 1] = 9.0 / 8.0
        coeffs[0, 9] = 1.0 / 8.0
        by = [None] + [basis.get(k) for k in range(1, 10)]
        return eval_lut_2d(ctx, coeffs, [None], by)

    def pair(self, state: CtPair) -> CtPair:
        out = self.one(stack_cts(self.ctx.align(*state)))
        o0, o1 = unstack_cts(out)
        return o0, o1


class NoiseReducer:
    """Generic order-m contractive re-anchoring f(x) = (1 + 1/m)x - (1/m)x^{m+1}
    (reference: NoiseReducer, noise_reduction.py:14-83, which was dead code
    there; live and tested here).  ``m`` is the codebook order (16 for
    nibbles, 256 for the byte domain)."""

    def __init__(self, ctx: CkksContext, m: int = 16, use_jit: bool = False):
        self.ctx = ctx
        self.m = m
        self._one = ctx.jit_fn(self._one_impl) if use_jit else self._one_impl

    def one(self, ct: Ciphertext) -> Ciphertext:
        return self._one(ct)

    def _one_impl(self, ct: Ciphertext) -> Ciphertext:
        ctx = self.ctx
        m = self.m
        basis = build_power_basis(ctx, ct, {m})
        x_m1 = ctx.multiply(basis[m], ct)
        coeffs = np.zeros((1, m + 2), np.complex128)
        coeffs[0, 1] = 1.0 + 1.0 / m
        coeffs[0, m + 1] = -1.0 / m
        by = [None] + [basis.get(k) for k in range(1, m + 1)] + [x_m1]
        return eval_lut_2d(ctx, coeffs, [None], by)

    def pair(self, state: CtPair) -> CtPair:
        out = self.one(stack_cts(self.ctx.align(*state)))
        o0, o1 = unstack_cts(out)
        return o0, o1


class Snap1D:
    """Apply a loaded degree-(<=15) polynomial over the mirrored zeta16 basis
    (reference: Zeta16Snap1D, snapper_1d_z16.py:17-83, driven by
    zeta16_snap_coeffs.json).

    No polynomial in this basis can actually snap: the snapped-phase target
    g(theta) = exp(i*snap_16(theta)) has Fourier support only at harmonics
    k = 1 mod 16, and the mirrored basis spans k in [-7, 8] — whose sole
    admissible harmonic is k = 1.  Any L2 fit therefore degenerates to
    c1*x with c1 = sinc(pi/16) ~ 0.99358, which is exactly what the
    reference's 8192-sample ridge fit "found" (c1 ~ 0.9936,
    gen/make_zeta16_snap_coeffs.py; SURVEY.md C21).  The class exists for
    parity and for applying *other* 1D maps; real snapping is ``Snap``."""

    def __init__(
        self,
        ctx: CkksContext,
        coeffs: np.ndarray | None = None,
        use_jit: bool = False,
    ):
        self.ctx = ctx
        if coeffs is None:
            from .luts import zeta16_snap_coeffs

            coeffs = zeta16_snap_coeffs()
        c = np.zeros((1, 16), np.complex128)
        c[0, : len(coeffs)] = np.asarray(coeffs)
        self.coeffs = c
        self.need = {q for q in range(1, 16) if abs(c[0, q]) > 1e-11}
        self._one = ctx.jit_fn(self._one_impl) if use_jit else self._one_impl

    def one(self, ct: Ciphertext) -> Ciphertext:
        return self._one(ct)

    def _one_impl(self, ct: Ciphertext) -> Ciphertext:
        ctx = self.ctx
        basis = build_power_basis(ctx, ct, self.need, mirror=16)
        by = [None] + [basis.get(k) for k in range(1, 16)]
        return eval_lut_2d(ctx, self.coeffs, [None], by)

    def pair(self, state: CtPair) -> CtPair:
        out = self.one(stack_cts(self.ctx.align(*state)))
        o0, o1 = unstack_cts(out)
        return o0, o1
