"""AES-128 homomorphic pipeline: round sequencing + noise policy.

Parity target: AESPipeline (reference: pipeline.py:28-254) with two
deliberate fixes:

- **Correct decryption** (fixes SURVEY.md quirk Q1): the round loop applies
  ISR -> ISB -> ARK -> InvMixColumns per README.md:86-94; the reference's
  committed decrypt dropped InvMixColumns (pipeline.py:230-237).
- **Explicit SnapPolicy** (fixes quirk Q4): stabilization between steps is a
  static, configurable policy instead of secret-key hard renorm hidden in the
  hot path:
    * NONE         — rely on precision alone (fine for a round or two);
    * POLY         — the zeta16 snap polynomial (no secret key, jittable);
    * BOOTSTRAP    — full CKKS refresh (ckks/bootstrap.py) followed by a
      snap; restores the level budget without the secret key;
    * DEBUG_RENORM — decrypt/re-encrypt exactly like the reference's
      ``_renorm_pair`` (pipeline.py:65-69).  Test-only: uses the secret key
      and resets the level budget; excluded from benchmark paths.
"""

from __future__ import annotations

import enum
from typing import Any

import numpy as np

from ..ckks.context import CkksContext
from .state import StateEncoder
from .ops import (
    CtPair,
    Xor4,
    AddRoundKey,
    SubBytes,
    ShiftRows,
    MixColumns,
    InvMixColumns,
    Snap,
    MagDamp,
    rotation_steps_required,
)

__all__ = ["SnapPolicy", "AES128"]


class SnapPolicy(enum.Enum):
    NONE = "none"
    POLY = "poly"
    BOOTSTRAP = "bootstrap"        # full refresh + snap (no secret key)
    DEBUG_RENORM = "debug_renorm"  # secret-key crutch; test-only


class AES128:
    """Homomorphic AES-128 over packed zeta16 nibble ciphertext pairs.

    ``encrypt_states``/``decrypt_states`` mirror the reference pipeline's
    ``encrypt``/``decrypt`` (pipeline.py:123-254); ``debug`` captures decoded
    per-stage snapshots like ``_log_pair`` (pipeline.py:84-98) — snapshot
    decoding uses the secret key and exists for differential testing only.
    """

    @staticmethod
    def required_rotations(ctx: CkksContext) -> list[int]:
        return rotation_steps_required(ctx.params.n_slots // 16)

    def __init__(
        self,
        ctx: CkksContext,
        policy: SnapPolicy = SnapPolicy.POLY,
        bootstrapper=None,
        use_jit: bool = False,
        stab_sync: bool | None = None,
        entry_limbs: int | None = None,
        merged_stab: bool = False,
        snap_count: int = 1,
        mag_damp: bool = False,
    ):
        self.ctx = ctx
        self.policy = policy
        # Two-stabilize round schedule: sub -> stab -> sr -> mc -> ark ->
        # stab (and the final round rides its trailing output stabilize
        # alone).  Requires the refresh to land with enough limbs for the
        # merged segment — sr(1) + mc(27) + ark(9) = 37 on the bench
        # chain, i.e. a >=102-prime chain landing at 38 (probed in
        # tools/probe_limbs.py) vs the 3-stab schedule's 34-limb landing
        # at 100 primes.  Cuts the refresh count of a 10-round encryption
        # from 30 stacked-pair bootstraps to 20 (decryption: 30 -> 21);
        # the refresh dominates enc10 wall time (~8-12 s per op+refresh
        # segment, DESIGN.md §18), so this is the single biggest lever on
        # the headline number.
        self.merged_stab = merged_stab
        # Snap applications per stabilize.  ONE snap on a slot with phase
        # error theta leaves magnitude ~|17/16 - (1/16)e^{i16 theta}|: the
        # worst XOR-chain tail at N=2^15 (theta ~ 3.4e-2, measured round-5
        # value diag) leaves |z| ~ 1.009 — which the S-box ^128 ladder
        # amplifies to 1.009^128 ~ 3.5, and the NEXT snap then DIVERGES
        # ((1/16)|x|^17 ~ 1e8 at |x|=3.5), wrecking MixColumns globally
        # (the enc.r2.mc cliff, DESIGN.md §22).  A SECOND snap contracts
        # the magnitude residual quadratically (1.009 -> ~0.9992), keeping
        # the ladder input inside the snap basin.  Costs ~12 limbs per
        # extra snap: the refresh must land deep enough (108-prime chain).
        self.snap_count = snap_count
        # Bounded magnitude damping (ops.MagDamp) applied BEFORE the snaps
        # in every stabilize: maps any |x| <= 4.06 into the unit disk with
        # codeword magnitudes preserved to O(delta^2), so an off-codebook
        # LUT output (|P(z)| up to ~3.5 measured) can never detonate the
        # snap's unbounded x^17 term.  Costs 4 ct*ct multiplies (~8 limbs)
        # per stabilize; pair with snap_count >= 2 and a deeper chain.
        self.mag_damp = mag_damp
        # Optional instrumentation: called as stage_hook(tag, ct_pair) at
        # every stage boundary (works under abstract tracing — the limb
        # probe drives the REAL pipeline through jax.eval_shape with this).
        self.stage_hook = None
        # Mod-switch fresh encryptions down to ``entry_limbs`` before round
        # 0 (exact: dropping RNS rows is ciphertext mod a divisor modulus).
        # Under the BOOTSTRAP policy every refresh lands at a fixed level
        # (34 limbs at the bench chain), so entering there makes round 0's
        # ark/stabilize programs IDENTICAL to every later round's — no
        # full-width programs exist anywhere in the pipeline, which both
        # removes ~4 program signatures from warmup and keeps round 0's
        # working set at the small per-round size (round-4 enc10 finding).
        self.entry_limbs = entry_limbs
        # Hard-sync (tiny dependent fetch) after every stabilize point.
        # The axon TPU tunnel dispatches asynchronously and its
        # block_until_ready returns early (DESIGN.md §13), so a full
        # 10-round encrypt_states otherwise enqueues EVERY round's programs
        # at once and the executor holds all queued intermediates live —
        # measured round-4: enc10 at N=2^15 RESOURCE_EXHAUSTED the 16 GB
        # chip exactly this way.  One ~28 ms round-trip per stabilize
        # bounds the in-flight window to a round segment (~1 s total over
        # 10 rounds — noise against multi-second kernels).  Default: on
        # when a real accelerator backend is active, off on CPU (tests,
        # virtual meshes — synchronous enough, and fetches break nothing
        # but cost time).  AES_FHE_STAB_SYNC=0/1 overrides.
        if stab_sync is None:
            import os

            env = os.environ.get("AES_FHE_STAB_SYNC")
            if env is not None:
                stab_sync = env != "0"
            else:
                import jax

                stab_sync = jax.default_backend() not in ("cpu",)
        self.stab_sync = stab_sync
        if policy is SnapPolicy.BOOTSTRAP and bootstrapper is None:
            from ..ckks.bootstrap import Bootstrapper

            bootstrapper = Bootstrapper(ctx, use_jit=use_jit)
        self.bootstrapper = bootstrapper
        self.encoder = StateEncoder(ctx)
        self.xor4 = Xor4(ctx, use_jit=use_jit)
        self.ark = AddRoundKey(self.xor4)
        self.sub = SubBytes(ctx, inverse=False, use_jit=use_jit)
        self.inv_sub = SubBytes(ctx, inverse=True, use_jit=use_jit)
        stride = self.encoder.stride
        self.shift = ShiftRows(ctx, stride, inverse=False, use_jit=use_jit)
        self.inv_shift = ShiftRows(ctx, stride, inverse=True, use_jit=use_jit)
        self.mix = MixColumns(ctx, self.xor4, stride, use_jit=use_jit)
        self.inv_mix = InvMixColumns(ctx, self.xor4, stride, use_jit=use_jit)
        self.snap = Snap(ctx, use_jit=use_jit)
        self.damp = MagDamp(ctx, use_jit=use_jit)
        self._rk_cache: dict[int, list[CtPair]] = {}

    # ------------------------------------------------------------------
    def prepare_round_keys(self, round_keys: list[np.ndarray]) -> list[CtPair]:
        """Encrypt the (plaintext) round keys once, broadcast across the
        block batch (reference cache: pipeline.py:75-81)."""
        key = hash(tuple(int(b) for rk in round_keys for b in rk))
        if key not in self._rk_cache:
            B = self.encoder.batch
            self._rk_cache[key] = [
                self.encoder.encrypt(np.tile(np.asarray(rk, np.uint8), (B, 1)))
                for rk in round_keys
            ]
        return self._rk_cache[key]

    def _stabilize(self, state: CtPair, debug: dict | None, tag: str) -> CtPair:
        if self.policy is SnapPolicy.POLY:
            if self.mag_damp:
                state = self.damp.pair(state)
            for _ in range(self.snap_count):
                state = self.snap.pair(state)
        elif self.policy is SnapPolicy.BOOTSTRAP:
            from ..ckks.types import stack_cts, unstack_cts

            # both nibbles refresh as ONE stacked bootstrap (every DFT /
            # EvalMod kernel sees a leading batch axis of 2)
            out = self.bootstrapper(stack_cts(self.ctx.align(*state)))
            state = tuple(unstack_cts(out))
            if self.mag_damp:
                state = self.damp.pair(state)
            for _ in range(self.snap_count):
                state = self.snap.pair(state)
        elif self.policy is SnapPolicy.DEBUG_RENORM:
            n = self.encoder.batch
            decoded = self.encoder.decrypt(state[0], state[1], n_blocks=n)
            state = self.encoder.encrypt(decoded)
        if self.stab_sync:
            self._sync(state, tag)
        if self.stage_hook is not None:
            self.stage_hook(tag, state)
        if debug is not None:
            debug[tag] = self._snapshot(state)
        return state

    def _sync(self, state: CtPair, tag: str) -> None:
        """Force completion of everything dispatched so far (see __init__)
        and optionally log progress + device memory (AES_FHE_LOG_ROUNDS=1)."""
        import os
        import sys
        import jax

        jax.device_get(state[0].data[..., :1, :1])
        if os.environ.get("AES_FHE_LOG_ROUNDS") == "1":
            import time

            now = time.time()
            dt = now - getattr(self, "_last_sync_t", now)
            self._last_sync_t = now
            print(
                f"[pipeline] {tag}: l={state[0].n_limbs} "
                f"segment={dt:.1f}s",
                file=sys.stderr,
                flush=True,
            )

    def _log(self, debug: dict | None, tag: str, state: CtPair) -> CtPair:
        if self.stage_hook is not None:
            self.stage_hook(tag, state)
        if debug is not None:
            debug[tag] = self._snapshot(state)
        return state

    def _snapshot(self, state: CtPair) -> np.ndarray:
        return self.encoder.decrypt(
            state[0], state[1], n_blocks=self.encoder.batch
        )

    # ------------------------------------------------------------------
    def encrypt_states(
        self,
        states: np.ndarray,
        round_keys: list[np.ndarray],
        n_rounds: int = 10,
        debug: dict[str, Any] | None = None,
        resume_ct: CtPair | None = None,
        start_round: int = 1,
        stop_round: int | None = None,
    ) -> CtPair:
        """Full homomorphic AES-128 encryption of packed plaintext blocks.

        ``resume_ct``/``start_round``/``stop_round`` run a SEGMENT of the
        encryption: resume from the state after round ``start_round - 1``'s
        stabilize, process rounds ``start_round .. stop_round - 1``, and
        (only when ``stop_round`` is None) finish with the final round.
        This is the checkpoint/resume hook that lets one logical encryption
        run as several processes (this environment's TPU tunnel silently
        corrupts results after ~6 refreshes in one process, DESIGN.md §18;
        the ciphertext pair round-trips exactly through
        utils/serialization between segments)."""
        rk = self.prepare_round_keys(round_keys)
        if resume_ct is not None:
            ct = resume_ct
        else:
            B = self.encoder.batch
            states = np.atleast_2d(np.asarray(states, np.uint8))
            if states.shape[0] < B:  # pad the batch with copies of block 0
                states = np.vstack(
                    [states, np.tile(states[:1], (B - states.shape[0], 1))]
                )
            ct = self.encoder.encrypt(states)
            if self.entry_limbs is not None:
                ct = tuple(
                    self.ctx.drop_limbs(
                        c, max(0, c.n_limbs - self.entry_limbs)
                    )
                    for c in ct
                )
            self._log(debug, "enc.input", ct)

            ct = self.ark(ct, rk[0])
            self._log(debug, "enc.r0.ark", ct)
            ct = self._stabilize(ct, debug, "enc.r0.stab")

        for r in range(start_round, n_rounds):
            ct = self._log(debug, f"enc.r{r}.sub", self.sub(*ct))
            ct = self._stabilize(ct, debug, f"enc.r{r}.sub.stab")
            ct = self._log(debug, f"enc.r{r}.sr", self.shift(ct))
            ct = self._log(debug, f"enc.r{r}.mc", self.mix(ct))
            if not self.merged_stab:
                ct = self._stabilize(ct, debug, f"enc.r{r}.mc.stab")
            ct = self._log(debug, f"enc.r{r}.ark", self.ark(ct, rk[r]))
            ct = self._stabilize(ct, debug, f"enc.r{r}.stab")
            if stop_round is not None and r + 1 >= stop_round:
                return ct  # segment end: caller resumes with start_round=r+1

        ct = self._log(debug, "enc.final.sub", self.sub(*ct))
        if not self.merged_stab:
            ct = self._stabilize(ct, debug, "enc.final.sub.stab")
        ct = self._log(debug, "enc.final.sr", self.shift(ct))
        ct = self._log(debug, "enc.final.ark", self.ark(ct, rk[n_rounds]))
        ct = self._stabilize(ct, debug, "enc.output")
        return ct

    def decrypt_states(
        self,
        ct: CtPair,
        round_keys: list[np.ndarray],
        n_rounds: int = 10,
        debug: dict[str, Any] | None = None,
        resume_ct: CtPair | None = None,
        start_round: int | None = None,
        stop_round: int | None = None,
    ) -> CtPair:
        """Full homomorphic AES-128 decryption — correct inverse order
        (ISR -> ISB -> ARK -> IMC), fixing reference quirk Q1.

        ``resume_ct``/``start_round``/``stop_round`` run a SEGMENT of the
        decryption, mirroring ``encrypt_states``'s checkpoint/resume hook
        (the loop counts DOWN here): resume from the state after inverse
        round ``start_round + 1``, process inverse rounds ``start_round ..
        stop_round`` descending, and return after round ``stop_round``
        (caller resumes with ``start_round = stop_round - 1``).  With
        ``stop_round=None`` the segment runs through the final round.
        ``start_round=0`` means final-round-only."""
        rk = self.prepare_round_keys(round_keys)
        if start_round is None:
            start_round = n_rounds - 1
        if resume_ct is not None:
            ct = resume_ct
        else:
            self._log(debug, "dec.input", ct)
            ct = self._log(
                debug, "dec.init.ark", self.ark(ct, rk[n_rounds])
            )
            ct = self._stabilize(ct, debug, "dec.init.stab")

        for r in range(start_round, 0, -1):
            ct = self._log(debug, f"dec.r{r}.isr", self.inv_shift(ct))
            ct = self._log(debug, f"dec.r{r}.isb", self.inv_sub(*ct))
            ct = self._stabilize(ct, debug, f"dec.r{r}.isb.stab")
            ct = self._log(debug, f"dec.r{r}.ark", self.ark(ct, rk[r]))
            if not self.merged_stab:
                ct = self._stabilize(ct, debug, f"dec.r{r}.ark.stab")
            ct = self._log(debug, f"dec.r{r}.imc", self.inv_mix(ct))
            ct = self._stabilize(ct, debug, f"dec.r{r}.imc.stab")
            if stop_round is not None and r <= stop_round:
                return ct  # segment end: resume with start_round=r-1

        ct = self._log(debug, "dec.final.isr", self.inv_shift(ct))
        ct = self._log(debug, "dec.final.isb", self.inv_sub(*ct))
        ct = self._stabilize(ct, debug, "dec.final.isb.stab")
        ct = self._log(debug, "dec.final.ark", self.ark(ct, rk[0]))
        ct = self._stabilize(ct, debug, "dec.output")
        return ct

    # convenience: decode a result pair back to bytes
    def decode(self, ct: CtPair, n_blocks: int | None = None) -> np.ndarray:
        n = self.encoder.batch if n_blocks is None else n_blocks
        return self.encoder.decrypt(ct[0], ct[1], n_blocks=n)
