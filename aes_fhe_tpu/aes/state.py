"""Packed AES state <-> ciphertext pair (hi/lo nibbles over zeta16 slots).

Functional equivalent of the reference's StateEncoder (reference:
state_encoder.py:8-38), generalized to a block-batch axis: n_slots/16 AES
blocks pack into ONE ciphertext pair.  Block b's byte i lives at slot
i*stride + b (stride = n_slots/16), hi/lo nibbles in separate ciphertexts,
each encoded as zeta16^v.  Unused slots hold 1+0j (= zeta16^0), as the
reference does (state_encoder.py:23-27).

Slot order is *row-major*: byte i (standard FIPS order, row i%4 / col i//4)
lands in slot block (4*(i%4) + i//4) * stride.  The transpose happens here,
host-side and free, so that MixColumns' column rotations become single global
slot rotations (see aes/ops.py module docstring; the reference mixed
column-first packing with row-major MixColumns rotations —
state_encoder.py:14-16 vs mixcol_final.py:101-102)."""

from __future__ import annotations

import numpy as np

from ..ckks.context import CkksContext
from ..ckks.types import Ciphertext
from .zeta import ZetaCodec

__all__ = ["StateEncoder"]


class StateEncoder:
    def __init__(self, ctx: CkksContext):
        self.ctx = ctx
        self.n_slots = ctx.params.n_slots
        self.stride = self.n_slots // 16
        self.batch = self.stride  # max AES blocks per ciphertext pair
        i = np.arange(16)
        self.slot_of_byte = 4 * (i % 4) + i // 4  # transpose: byte -> slot

    def pack_slots(self, states: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """states: u8 [B, 16] (B <= stride) -> (hi, lo) complex [n_slots]."""
        states = np.atleast_2d(np.asarray(states, np.uint8))
        B = states.shape[0]
        assert states.shape[1] == 16 and B <= self.stride
        hi = np.ones(self.n_slots, np.complex128)
        lo = np.ones(self.n_slots, np.complex128)
        zhi = ZetaCodec.to_zeta(states >> 4, 16)       # [B, 16]
        zlo = ZetaCodec.to_zeta(states & 0x0F, 16)
        idx = (
            self.slot_of_byte[None, :] * self.stride + np.arange(B)[:, None]
        )
        hi[idx] = zhi
        lo[idx] = zlo
        return hi, lo

    def unpack_slots(
        self, hi: np.ndarray, lo: np.ndarray, n_blocks: int = 1
    ) -> np.ndarray:
        idx = (
            self.slot_of_byte[None, :] * self.stride
            + np.arange(n_blocks)[:, None]
        )
        h = ZetaCodec.from_zeta(hi[idx], 16)
        l = ZetaCodec.from_zeta(lo[idx], 16)
        return ((h << 4) | l).astype(np.uint8)

    def encrypt(
        self, states: np.ndarray, limbs: int | None = None
    ) -> tuple[Ciphertext, Ciphertext]:
        hi, lo = self.pack_slots(states)
        ctx = self.ctx
        p = ctx.params
        if p.scale < (1 << 40):
            # Depth-diet chains: fresh-encryption noise relative to a bare
            # Δ=2^29 is ~2^-12.6 at N=2^15 (e ~ sigma*sqrt(N*h)), and the
            # degree-255 S-box ladder amplifies it ~x(deg) — measured on
            # the chip: 2706/16384 bytes wrong with |z| up to 12 ~
            # (1+eps)^128.  Standard fix: encrypt ONE level up at scale
            # Delta*q_top and rescale once — the absolute noise divides by
            # q_top and the relative floor drops to ~2^-29 for the cost of
            # a single limb.
            from fractions import Fraction

            l = p.n_limbs if limbs is None else limbs
            s = Fraction(p.scale) * p.moduli[l - 1]
            return (
                ctx.rescale(ctx.encrypt(hi, limbs=l, scale=s), 1),
                ctx.rescale(ctx.encrypt(lo, limbs=l, scale=s), 1),
            )
        return ctx.encrypt(hi, limbs=limbs), ctx.encrypt(lo, limbs=limbs)

    def decrypt(
        self, ct_hi: Ciphertext, ct_lo: Ciphertext, n_blocks: int = 1
    ) -> np.ndarray:
        hi = self.ctx.decrypt_values(ct_hi)
        lo = self.ctx.decrypt_values(ct_lo)
        return self.unpack_slots(hi, lo, n_blocks)
