"""Integer <-> root-of-unity codec for CKKS slots.

Functional equivalent of the reference's ZetaEncoder (reference:
utils.py:8-19): value v maps to zeta_m^v with zeta_m = exp(-2*pi*i/m); decode
is *phase-only* (deliberately magnitude-insensitive — the property the whole
LUT algebra leans on, SURVEY.md quirk Q2)."""

from __future__ import annotations

import numpy as np

__all__ = ["ZetaCodec"]


class ZetaCodec:
    @staticmethod
    def to_zeta(arr: np.ndarray, modulus: int) -> np.ndarray:
        zeta = np.exp(-2j * np.pi / modulus)
        return zeta ** (np.asarray(arr) % modulus)

    @staticmethod
    def from_zeta(z: np.ndarray, modulus: int) -> np.ndarray:
        angle = np.angle(np.asarray(z))
        k = (-angle * modulus) / (2 * np.pi)
        return np.mod(np.rint(k), modulus).astype(np.uint8)
