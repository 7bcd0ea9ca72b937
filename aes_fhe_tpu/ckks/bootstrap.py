"""CKKS bootstrapping: ModRaise -> CoeffToSlot -> EvalMod -> SlotToCoeff.

The reference delegated bootstrapping entirely to the closed engine
(engine_context.py:147-162) and triggered it from exception ladders; here it
is an explicit, statically-scheduled pipeline over this engine's own verbs:

1. **Rebase + ModRaise** — the input is first brought to the small bootstrap
   scale Delta_b (~2^20) so the message fits a SINGLE ~30-bit prime q0 with a
   small ratio Delta_b/q0 ~ 2^-10 (sub-31-bit limbs cannot hold the working
   scale 2^58 — the classic 32-bit-RNS bootstrap constraint).  The q0
   residues are then read as centered integers and extended to the full
   chain: the ciphertext decrypts to u = m~ + q0*I, |I| <~ O(sqrt(h)) for a
   Hamming-weight-h secret (exact centering: single-source conversion has no
   overshoot).
2. **CoeffToSlot** — inverse homomorphic DFT (ckks/dft.py) onto the packed
   layout z[s] = u_A[s] - i*u_B[s]; relabeling the declared scale to q0
   makes the slot values u/q0 directly (scale is just the decode divisor).
3. **EvalMod** — centered fractional part via the complex exponential:
   a short Taylor series of exp(2*pi*i*t/2^r) (range <= ~0.35 rad, degree
   ~12 — the monomial basis is well-conditioned there), squared r times to
   exp(2*pi*i*t) (periodicity kills q0*I), then an arcsin-corrected
   imaginary part:  x ~ s + (2pi)^2 s^3/6,  s = sin(2pi t)/(2pi), evaluated
   from z and z^3 directly.  Applied to both conjugation-split real vectors.
4. **SlotToCoeff** — forward DFT stages on t0 - i*t1; a final relabel by
   Delta_b/q0 restores message semantics.

Output precision ~2^-24 (quantization of Delta_b plus EvalMod residuals);
the AES pipeline's snap polynomial re-anchors codewords right after.
"""

from __future__ import annotations

import math
from fractions import Fraction

import numpy as np

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
    @staticmethod
    def range_plan(n: int, h: int, theta_max: float = 0.35):
        """EvalMod range ``K`` and double-angle count ``r`` for ring degree
        ``n`` and secret Hamming weight ``h`` — static so tests can pin it.

        Centered ModRaise: per-coefficient I ~ Gaussian with sigma =
        sqrt(h/12).  EvalMod must cover the MAX |I| over all 2N lift
        coefficients of ~30 refreshes per run, so the multiplier is the
        extreme-value quantile sqrt(2*ln(2N)) plus margin — NOT a fixed
        4.5 (round-4 root cause: at N=2^15 the old 4.5-sigma,
        N-independent bound was exceeded by ONE coefficient at a random
        refresh in every 10-round pipeline run, corrupting all slots of
        that ciphertext at once — while logn<=8 tests, with a
        256-coefficient max, never saw it.  diag_rounds.py showed the
        cliff; diag_leak.py proved the same refresh on a below-bound
        input is exact 12/12 times).  And the range must satisfy
        K/2 >= bound: the old next_pow2(bound) gave K=32 -> range 16 <
        bound 21 even at its own 4.5 sigma."""
        z = math.sqrt(2.0 * math.log(2.0 * n)) + 1.5
        bound = z * math.sqrt(h / 12.0) + 3.0
        K = max(8, 1 << math.ceil(math.log2(2.0 * bound)))
        r = math.ceil(math.log2(2 * math.pi * (K / 2 + 1) / theta_max))
        return K, r

    def __init__(
        self,
        ctx: CkksContext,
        group: int = 3,
        taylor_deg: int = 12,
        K: int | None = None,
        theta_max: float = 0.35,
        boot_scale_bits: int | None = None,
        c2s_diag_bits: int = 40,
        use_jit: bool = False,
    ):
        self.ctx = ctx
        p = ctx.params
        import os as _os

        if boot_scale_bits is None and _os.environ.get("AES_FHE_BOOT_SCALE_BITS"):
            # Round-5 lever: every refresh error is amplified by q0/Delta_b
            # into the message (2^10 at the default 20 bits -> measured
            # 2e-4 post-snap floor, which the S-box x128 ladder turns into
            # the ~3e-2 stabilize-input tails that defeat the snap basin).
            # The EvalMod frac window (theta_max/2pi ~ 0.056) leaves room
            # for Delta_b up to ~2^24 at q0 ~ 2^30: m*Delta_b/q0 = 0.016
            # per unit message — floor drops ~16x, and with it every
            # downstream tail, at ZERO chain-depth cost.
            boot_scale_bits = int(_os.environ["AES_FHE_BOOT_SCALE_BITS"])
        if boot_scale_bits is None:
            # The refresh amplifies every error made after ModRaise by
            # q0/Delta_b (the message sits that far below the working
            # scale).  On Δ=2^58 chains the noise floor (~2^-40) affords
            # Delta_b = 2^20 (amplification 2^10); on Δ=2^29 depth-diet
            # chains the floor is ~2^-20, so Delta_b must rise to 2^26
            # (amplification 2^4) or the message drowns (measured: err
            # 1.1 at 2^20 -> 1.5e-2 at 2^26, logn=7 — the snap polynomial
            # then re-anchors exactly).
            boot_scale_bits = 20 if p.scale >= (1 << 40) else 26
        h = ctx.secret_hamming or (2 * p.n) // 3
        if K is None:
            K, _ = self.range_plan(p.n, h, theta_max)
        assert K % 2 == 0
        self.K = K
        # symmetric range |t| <= K/2: phase 2*pi*(K/2+1)/2^r <= theta_max
        self.r = math.ceil(math.log2(2 * math.pi * (K / 2 + 1) / theta_max))
        self.taylor_deg = taylor_deg
        self.boot_scale = Fraction(1 << boot_scale_bits)
        # Work scale for the bootstrap INTERIOR (ModRaise boost, C2S target,
        # EvalMod, repack).  On single-prime depth-diet chains (Δ=2^29) the
        # interior previously ran at the chain scale: every rescale then
        # quantizes at 2^-29 relative and the ModRaise boost collapses to 1,
        # landing the refresh error at 2.5e-2 (measured, logn=8) — fatal for
        # the degree-255 S-box even after snapping.  Running the interior at
        # Δ² = 2^58 (scales are exact Fractions; one "rescale" simply drops
        # TWO primes, self.mul_drop) restores the deep chain's per-op
        # precision while the AES layer outside keeps the depth diet.
        p_scale = Fraction(p.scale)
        if p.scale >= (1 << 40):
            self.work_scale = p_scale
            self.mul_drop = p.rescale_drop
        else:
            self.work_scale = p_scale * p_scale
            self.mul_drop = 2 * p.rescale_drop

        fwd = merge_stage_ops(s2c_stage_ops(p.n), group)
        inv = merge_stage_ops(c2s_stage_ops(p.n), group)
        self.s2c = HomDft(ctx, fwd)
        # C2S feeds EvalMod: its absolute output error multiplies by q0/Delta_b,
        # so its diagonals carry extra precision.
        self.c2s = HomDft(ctx, inv, diag_scale_bits=c2s_diag_bits)
        rots = stage_offsets(fwd, p.n_slots) | stage_offsets(inv, p.n_slots)
        ctx.add_galois_keys(
            [ctx.galois_element_for_rotation(d) for d in sorted(rots)]
            + [p.two_n - 1]
        )

        self._q0 = p.moduli[0]
        self._mr_conv = make_conv_tables((self._q0,), p.moduli)
        # EvalMod as TWO jitted programs (Taylor basis + polynomial, then
        # the r squarings + arcsin correction): the single combined program
        # (~25 keyswitches) exceeded this environment's remote-TPU-compiler
        # size limit (HTTP 500, round-4) and fell back to eager every run.
        # The DFT stages are already fused per stage (ctx.rotate_mul_accum),
        # so with this the bootstrap hot path is entirely compiled.
        if use_jit:
            # THREE mid-size programs instead of one: the combined EvalMod
            # exceeded the remote compiler's size limit, and even the
            # squarings+arcsin half over-reserved workspace and
            # RESOURCE_EXHAUSTED at execution (round-4).  At roughly a
            # dozen keyswitches each, all three compile and execute; the
            # eager alternative paid ~0.1-0.3 s tunnel latency per kernel
            # dispatch, dominating the refresh.
            self._ef_poly = ctx.jit_fn(self.eval_frac_poly)
            self._ef_sq = ctx.jit_fn(self.eval_frac_sq)
            self._ef_asin = ctx.jit_fn(self.eval_frac_asin)
        else:
            self._ef_poly = self.eval_frac_poly
            self._ef_sq = self.eval_frac_sq
            self._ef_asin = self.eval_frac_asin
        # Hard-sync between refresh phases on real accelerator backends:
        # the tunnel dispatches the whole refresh (5 C2S stages + EvalMod +
        # 5 S2C stages) asynchronously, and the queued programs' workspaces
        # overlap enough to RESOURCE_EXHAUST the chip even though the same
        # phases run fine back-to-back with syncs between (round-4 enc10
        # autopsy, tools/diag_enc10_mem.py).  ~5 fetches x ~28 ms per
        # refresh — noise against the refresh itself.
        import os

        env = os.environ.get("AES_FHE_BOOT_SYNC")
        if env is not None:
            self._phase_sync = env != "0"
        else:
            import jax

            self._phase_sync = jax.default_backend() not in ("cpu",)

    def _eval_frac(self, t_ct: Ciphertext) -> Ciphertext:
        return self._ef_asin(self._ef_sq(self._ef_poly(t_ct)))

    def _ef_iter(self, z: Ciphertext) -> Ciphertext:
        zq = self._ef_sq(z)
        self._sync(zq)
        return self._ef_asin(zq)

    def _sync(self, ct: Ciphertext) -> None:
        if self._phase_sync:
            import jax

            jax.device_get(ct.data[..., :1, :1])

    # ------------------------------------------------------------------
    def mod_raise(self, ct: Ciphertext) -> Ciphertext:
        """q0 residues -> full chain; declared scale becomes q0 so slot
        values read u/q0.  Expects ct at the bootstrap scale."""
        ctx = self.ctx
        p = ctx.params
        ct = ctx.drop_limbs(ct, ct.n_limbs - 1)
        coeff = ctx._intt(ct.data, (0,))
        ext = base_convert_centered(
            coeff, self._mr_conv, ctx._conv_plane
        )  # [2, L, N]
        data = ctx._ntt(ext, tuple(range(p.n_limbs)))
        raised = Ciphertext(data=data, scale=Fraction(self._q0), ntt=True)
        # Boost by an exact integer constant to ~the interior work scale: at
        # the raw scale q0 ~ 2^30 the engine noise floor (~2^10) would sit
        # at 2^-20 of t and get amplified by q0/Delta_b into the message.
        # An integer scalar multiply is exact and costs no level.
        boost = max(1, round(self.work_scale / self._q0))
        return ctx.mul_scalar(raised, 1.0, Fraction(boost))

    def eval_frac(self, t_ct: Ciphertext) -> Ciphertext:
        """Slots hold real t in (-K/2, K/2); returns the arcsin-corrected
        centered fractional part of t.  (Un-jitted composition — the jitted
        path is self._eval_frac, split into the two programs below.)"""
        return self.eval_frac_iter(self.eval_frac_poly(t_ct))

    def eval_frac_poly(self, t_ct: Ciphertext) -> Ciphertext:
        """EvalMod part A: w = c*t at the work scale, Taylor power basis,
        polynomial evaluation -> z ~ exp(2*pi*i*t/2^r)."""
        from ..aes.lut_eval import build_power_basis, eval_lut_2d

        ctx = self.ctx
        c = 2j * math.pi / (1 << self.r)
        # encode the phase constant so w lands at exactly the interior work
        # scale (any excess would amplify through the Taylor power basis);
        # nd = mul_drop keeps the scalar's own encoding scale ~work_scale,
        # i.e. the constant carries ~2^-51 relative error, not 2^-23 —
        # phase-constant error doubles through every squaring below.
        l = t_ct.n_limbs
        p = ctx.params
        nd = self.mul_drop
        drops = math.prod(p.moduli[l - 1 - i] for i in range(nd))
        s_c = self.work_scale * drops / t_ct.scale
        w = ctx.rescale(ctx.mul_scalar(t_ct, c, s_c), nd)
        basis = build_power_basis(
            ctx, w, set(range(2, self.taylor_deg + 1)), drop=self.mul_drop,
            serialize=True,  # bound EvalMod's keyswitch transients (OOM fix)
        )
        coeffs = np.zeros((1, self.taylor_deg + 1), np.complex128)
        fact = 1.0
        for k in range(self.taylor_deg + 1):
            coeffs[0, k] = 1.0 / fact
            fact *= k + 1
        by = [None] + [basis.get(k) for k in range(1, self.taylor_deg + 1)]
        return eval_lut_2d(
            ctx, coeffs, [None], by, delta_out=self.work_scale,
            min_coeff_scale_bits=36,
        )

    def eval_frac_iter(self, z: Ciphertext) -> Ciphertext:
        """EvalMod part B (un-jitted composition of the two programs)."""
        return self.eval_frac_asin(self.eval_frac_sq(z))

    def eval_frac_sq(self, z: Ciphertext) -> Ciphertext:
        """EvalMod part B1: square z up r times to exp(2*pi*i*t)."""
        ctx = self.ctx
        for _ in range(self.r):
            z = ctx.multiply(z, z, drop=self.mul_drop)
        return z

    def eval_frac_asin(self, z: Ciphertext) -> Ciphertext:
        """EvalMod part B2: arcsin-corrected imaginary part.

        x ~ s + (2pi)^2/6 * s^3,  s = (z - zbar)/(4*pi*i),
        s^3 = ((z^3 - zbar^3) - 3(z - zbar)) / (4*pi*i)^3
          => x ~ a*(z - zbar) + b*(z^3 - zbar^3),
             a = -9i/(32*pi),  b = +i/(96*pi)
        (verified numerically: residual ~1e-9 on the working range)"""
        ctx = self.ctx
        z3 = ctx.multiply(
            ctx.multiply(z, z, drop=self.mul_drop), z, drop=self.mul_drop
        )
        d1 = ctx.sub(z, ctx.conjugate(z))
        d3 = ctx.sub(z3, ctx.conjugate(z3))
        l = min(d1.n_limbs, d3.n_limbs)
        d1 = ctx.drop_limbs(d1, d1.n_limbs - l)
        d3 = ctx.drop_limbs(d3, d3.n_limbs - l)
        target = max(d1.scale, d3.scale) * Fraction(1 << 30)
        t1 = ctx.mul_scalar(d1, -9j / (32 * math.pi), target / d1.scale)
        t3 = ctx.mul_scalar(d3, 1j / (96 * math.pi), target / d3.scale)
        return ctx.rescale(ctx.add(t1, t3), 1)

    # ------------------------------------------------------------------
    def __call__(self, ct: Ciphertext) -> Ciphertext:
        """Refresh: same message, high level."""
        ctx = self.ctx
        ctx.stats["bootstrap"] += 1

        ct = ctx.to_scale(ct, self.boot_scale)
        orig_scale = ct.scale  # ~Delta_b (exact tracked value)

        raised = self.mod_raise(ct)
        self._sync(raised)
        z = ctx.to_scale(self.c2s(raised), self.work_scale)
        self._sync(z)

        # conjugation split: z = t0 - i*t1 with t0, t1 real
        zc = ctx.conjugate(z)
        s_half = Fraction(1 << 29)
        t0 = ctx.rescale(ctx.mul_scalar(ctx.add(z, zc), 0.5, s_half), 1)
        t1 = ctx.rescale(
            ctx.mul_scalar(ctx.sub(zc, z), -0.5j, s_half), 1
        )

        # Both conjugation-split halves ride ONE EvalMod (leading batch
        # axis) on CPU; on the accelerator they run SEQUENTIALLY — the
        # stacked program's working set sat within ~1 GiB of the 15 GiB
        # limit and OOM'd intermittently (round-4: the same refresh at
        # batch 2 passed or failed run-to-run with identical inputs).
        # Halving the batch halves every keyswitch transient for the same
        # total work.
        from .types import stack_cts, unstack_cts

        if self._phase_sync:
            halves = []
            for t in (t0, t1):
                fp = self._ef_poly(t)
                self._sync(fp)
                fi = self._ef_iter(fp)
                self._sync(fi)
                halves.append(fi)
            f01 = stack_cts(self.ctx.align(*halves))
        else:
            f01 = self._eval_frac(stack_cts([t0, t1]))
        f0, f1 = unstack_cts(f01)

        # repack z' = f0 - i*f1 at exactly matched scales
        l = min(f0.n_limbs, f1.n_limbs)
        f0 = ctx.drop_limbs(f0, f0.n_limbs - l)
        f1 = ctx.drop_limbs(f1, f1.n_limbs - l)
        target = f0.scale * Fraction(1 << 29)
        a = ctx.mul_scalar(f0, 1.0, target / f0.scale)
        b = ctx.mul_scalar(f1, -1j, target / f1.scale)
        z2 = ctx.rescale(ctx.add(a, b), 1)

        out = self.s2c(z2)
        self._sync(out)
        new_scale = out.scale * orig_scale / Fraction(self._q0)
        out = Ciphertext(data=out.data, scale=new_scale, ntt=True)
        # Rebase to the working scale: new_scale sits ~2^9 below Delta, and
        # any scale deficit amplifies exponentially through downstream power
        # bases (x^k scale = Delta*(s/Delta)^k — integers underflow by x^8).
        return ctx.to_scale(out, Fraction(ctx.params.scale))
