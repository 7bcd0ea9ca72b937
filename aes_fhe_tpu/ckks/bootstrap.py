"""CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod -> SlotToCoeff.

The reference delegated bootstrapping entirely to the closed engine
(engine_context.py:147-162) and triggered it from exception ladders; here it
is an explicit, statically-scheduled pipeline over this engine's own verbs:

1. **ModRaise** — re-read the base-modulus residues (B = product of the
   n_base primes) as integers and fast-base-extend them to the full chain:
   the ciphertext now decrypts to u = m~ + B*I with |I| <~ O(sqrt(h)) for a
   Hamming-weight-h secret.  The conversion overshoot (+alpha*B, alpha < 3)
   just shifts I.
2. **CoeffToSlot** — inverse homomorphic DFT (ckks/dft.py) onto the packed
   layout z[s] = u_A[s] - i*u_B[s]; declared-scale relabeling to B makes the
   slot values u/B directly (scale is just the decode divisor).
3. **EvalMod** — centered fractional part via the complex exponential:
   evaluate a short Taylor series of exp(2*pi*i*(t - K/2)/2^r) (range <=
   ~0.35 rad, degree ~12, monomial basis is well-conditioned there), square
   r times to reach exp(2*pi*i*t) — periodicity in t kills the B*I part —
   and take the imaginary part: frac_c(t) = sin(2*pi*t)/(2*pi).  Applied to
   the two conjugation-split real vectors.
4. **SlotToCoeff** — forward DFT stages on t0 - i*t1; a final scale
   relabeling by orig_scale/B turns u/B values back into the message.

Output precision is ~ scale * orig_scale / B (~2^25 for Delta=2^58, 3 base
primes) — standard CKKS bootstrap behavior; the AES pipeline's snap
polynomial re-anchors codewords right after.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np
import jax.numpy as jnp

from ..core.rns import make_conv_tables, base_convert_centered
from ..core.ntt import ntt, intt
from .context import CkksContext
from .types import Ciphertext
from .dft import (
    s2c_stage_ops,
    c2s_stage_ops,
    merge_stage_ops,
    stage_offsets,
    HomDft,
)

__all__ = ["Bootstrapper"]


class Bootstrapper:
    def __init__(
        self,
        ctx: CkksContext,
        group: int = 3,
        taylor_deg: int = 12,
        K: int | None = None,
        theta_max: float = 0.35,
    ):
        self.ctx = ctx
        p = ctx.params
        h = ctx.secret_hamming or (2 * p.n) // 3
        if K is None:
            # centered ModRaise: per-coefficient spread sigma ~ sqrt(h/12)*B
            bound = 6.0 * math.sqrt(h / 12.0) + 3.0
            K = max(16, 1 << math.ceil(math.log2(2.0 * bound)))
        assert K % 2 == 0
        self.K = K
        # symmetric range |t| <= K/2: phase 2*pi*(K/2+1)/2^r <= theta_max
        self.r = math.ceil(math.log2(2 * math.pi * (K / 2 + 1) / theta_max))
        self.taylor_deg = taylor_deg

        fwd = merge_stage_ops(s2c_stage_ops(p.n), group)
        inv = merge_stage_ops(c2s_stage_ops(p.n), group)
        self.s2c = HomDft(ctx, fwd)
        self.c2s = HomDft(ctx, inv)
        rots = stage_offsets(fwd, p.n_slots) | stage_offsets(inv, p.n_slots)
        ctx.add_galois_keys(
            [ctx.galois_element_for_rotation(d) for d in sorted(rots)]
            + [p.two_n - 1]
        )

        self._b = math.prod(p.moduli[: p.n_base])
        self._mr_conv = make_conv_tables(
            p.moduli[: p.n_base], p.moduli
        )

    # ------------------------------------------------------------------
    def mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """Base residues -> full chain; declared scale becomes B so slot
        values read u/B."""
        ctx = self.ctx
        p = ctx.params
        nb = p.n_base
        ct = ctx.drop_limbs(ct, ct.n_limbs - nb)
        coeff = intt(ct.data, ctx._tab(nb))
        ext = base_convert_centered(coeff, self._mr_conv)  # [2, L, N]
        data = ntt(ext, ctx._tab(p.n_limbs))
        return Ciphertext(data=data, scale=Fraction(self._b), ntt=True)

    def eval_frac(self, t_ct: Ciphertext) -> Ciphertext:
        """Slots hold real t in (-K/2, K/2); returns slots frac_c(t) =
        sin(2*pi*t)/(2*pi) (value in [-1/2, 1/2])."""
        from ..aes.lut_eval import build_power_basis, eval_lut_2d

        ctx = self.ctx
        # ModRaise is centered, so t is already symmetric around 0.
        c = 2j * math.pi / (1 << self.r)
        w = ctx.rescale(
            ctx.mul_scalar(t_ct, c, Fraction(1 << 29)), 1
        )
        basis = build_power_basis(
            ctx, w, set(range(2, self.taylor_deg + 1))
        )
        coeffs = np.zeros((1, self.taylor_deg + 1), np.complex128)
        fact = 1.0
        for k in range(self.taylor_deg + 1):
            coeffs[0, k] = 1.0 / fact
            fact *= k + 1
        by = [None] + [basis.get(k) for k in range(1, self.taylor_deg + 1)]
        z = eval_lut_2d(
            ctx, coeffs, [None], by, min_coeff_scale_bits=36
        )
        for _ in range(self.r):
            z = ctx.multiply(z, z, drop=2)
        # frac = Im(z)/(2*pi) = (z - conj(z)) * (-i / (4*pi))
        zc = ctx.conjugate(z)
        d = ctx.sub(z, zc)
        out = ctx.mul_scalar(d, -0.25j / math.pi, Fraction(1 << 29))
        return ctx.rescale(out, 1)

    # ------------------------------------------------------------------
    def __call__(self, ct: Ciphertext) -> Ciphertext:
        """Refresh: same message, high level.  Requires |values| small enough
        that m~ = scale*value fits well under B (scale/B <= ~2^-30)."""
        ctx = self.ctx
        orig_scale = ct.scale
        ctx.stats["bootstrap"] += 1

        raised = self.mod_raise(ct)
        # C2S output inherits the huge ModRaise scale ~B; rebase near Delta
        # or every Taylor power would amplify the ~2^33 scale excess and
        # blow the coefficient-encoding budget.
        z = ctx.to_scale(self.c2s(raised), Fraction(ctx.params.scale))

        # conjugation split: z = t0 - i*t1 with t0, t1 real
        zc = ctx.conjugate(z)
        s_half = Fraction(1 << 29)
        t0 = ctx.rescale(ctx.mul_scalar(ctx.add(z, zc), 0.5, s_half), 1)
        t1 = ctx.rescale(
            ctx.mul_scalar(ctx.sub(zc, z), -0.5j, s_half), 1
        )

        f0 = self.eval_frac(t0)
        f1 = self.eval_frac(t1)

        # repack z' = f0 - i*f1 at exactly matched scales
        l = min(f0.n_limbs, f1.n_limbs)
        f0 = ctx.drop_limbs(f0, f0.n_limbs - l)
        f1 = ctx.drop_limbs(f1, f1.n_limbs - l)
        target = f0.scale * Fraction(1 << 29)
        a = ctx.mul_scalar(f0, 1.0, target / f0.scale)
        b = ctx.mul_scalar(f1, -1j, target / f1.scale)
        z2 = ctx.rescale(ctx.add(a, b), 1)

        out = self.s2c(z2)
        new_scale = out.scale * orig_scale / Fraction(self._b)
        return Ciphertext(data=out.data, scale=new_scale, ntt=True)
