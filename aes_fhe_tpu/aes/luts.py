"""Offline LUT coefficient generation over roots of unity (unit-normalized).

Regenerates, from first principles, every coefficient set the reference ships
as gen/coeff/*.json (reference: gen/generate_xor4_coeffs.py,
gen/generate_sobx_coeffs.py, gen/generate_gf_mult_2var_coeff.py):

- xor4:        16x16 bivariate, P(z^p, z^q) = z^(p XOR q), zeta16 domain.
               Nonzeros land only on odd (p, q) — 64 terms.
- sbox hi/lo:  degree-255 univariate over zeta256, value zeta16^{nib(SBOX[b])}.
- inv sbox:    same with INV_SBOX.
- gf_mult k:   16x16 bivariate per output nibble, value
               zeta16^{nib(gf_mul(byte, k))}, for k in {1,2,3,9,11,13,14}.
- lift:        degree-15 univariate mapping zeta16^v -> zeta256^v.

All sets use *unit-normalized* ifft (this fixes the reference's x256-scaled
XOR coefficients, SURVEY.md quirk Q2 / gen/generate_xor4_coeffs.py:17, which
forced hard renorm after every XOR there).  ``verify_*`` helpers re-evaluate
every polynomial on all inputs exactly, mirroring the reference's
quick_verify discipline (gen/generate_gf_mult_2var_coeff.py:80-103); they run
as unit tests here."""

from __future__ import annotations

import functools

import numpy as np

from .reference import SBOX, INV_SBOX, gf_mul
from .zeta import ZetaCodec

__all__ = [
    "xor4_coeffs",
    "sbox_coeffs",
    "gf_mult_coeffs",
    "gf_mult_byte_coeffs",
    "gf_mult_byte_split_coeffs",
    "split256_coeffs",
    "zeta16_snap_coeffs",
    "lift16_to_256_coeffs",
    "verify_bivariate_16",
    "verify_univariate_256",
]

TOL = 1e-11


def _sparsify(c: np.ndarray) -> np.ndarray:
    out = c.copy()
    out[np.abs(out) < TOL] = 0.0
    return out


@functools.lru_cache(maxsize=None)
def xor4_coeffs() -> np.ndarray:
    """[16,16] complex: sum_{p,q} c[p,q] x^p y^q = zeta16^(a XOR b) on the
    codebook x=zeta16^a, y=zeta16^b."""
    a = np.arange(16)
    F = ZetaCodec.to_zeta(a[:, None] ^ a[None, :], 16)
    return _sparsify(np.fft.ifft2(F))


@functools.lru_cache(maxsize=None)
def sbox_coeffs(inverse: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) each [256] complex over zeta256: byte b -> zeta16^{nibble}."""
    table = INV_SBOX if inverse else SBOX
    hi = ZetaCodec.to_zeta(table >> 4, 16)
    lo = ZetaCodec.to_zeta(table & 0x0F, 16)
    return _sparsify(np.fft.ifft(hi)), _sparsify(np.fft.ifft(lo))


@functools.lru_cache(maxsize=None)
def gf_mult_coeffs(k: int) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) each [16,16]: (h, l) nibbles of byte -> nibbles of k*byte in
    GF(2^8)."""
    bytes_ = (np.arange(16)[:, None] << 4) | np.arange(16)[None, :]
    prod = np.vectorize(lambda b: gf_mul(int(b), k))(bytes_).astype(np.uint8)
    hi = ZetaCodec.to_zeta(prod >> 4, 16)
    lo = ZetaCodec.to_zeta(prod & 0x0F, 16)
    return _sparsify(np.fft.ifft2(hi)), _sparsify(np.fft.ifft2(lo))


@functools.lru_cache(maxsize=None)
def gf_mult_byte_coeffs(k: int) -> np.ndarray:
    """[256] complex over zeta256: byte codeword -> byte codeword of k*b in
    GF(2^8) (the byte-domain multiplier LUTs of the reference's experimental
    MixColumns, temp/mix_columns_enc.py:64-72)."""
    prod = np.array([gf_mul(b, k) for b in range(256)], np.uint8)
    z256 = np.exp(-2j * np.pi / 256)
    return _sparsify(np.fft.ifft(z256 ** prod.astype(np.float64)))


@functools.lru_cache(maxsize=None)
def gf_mult_byte_split_coeffs(k: int) -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) each [256] over zeta256: byte codeword -> zeta16 nibble
    codewords of k*b in GF(2^8).  The composition split o gf_mult_byte as a
    single LUT pair — the byte-domain MixColumns building block
    (aes/experimental.py; reference: temp/mix_columns_enc.py:158-179 did the
    split as a separate stage)."""
    prod = np.array([gf_mul(b, k) for b in range(256)], np.uint8)
    hi = _sparsify(np.fft.ifft(ZetaCodec.to_zeta(prod >> 4, 16)))
    lo = _sparsify(np.fft.ifft(ZetaCodec.to_zeta(prod & 0x0F, 16)))
    return hi, lo


@functools.lru_cache(maxsize=None)
def split256_coeffs() -> tuple[np.ndarray, np.ndarray]:
    """(hi, lo) each [256] over zeta256: byte codeword -> zeta16 codewords of
    its two nibbles (reference C19's split_hi/split_lo sets,
    gen/generate_sobx_coeffs.py:92-115).

    Structure (verified): split_hi depends only on the hi nibble -> exactly
    16 nonzeros at multiples of 16; split_lo is the single monomial x^16
    (zeta256^{16b} = zeta16^b = zeta16^{b mod 16}) — the reference's
    '4 squarings' low-depth trick (temp/shiftrows_mixcolumns_fused.py:180-224)
    is exactly this monomial."""
    b = np.arange(256)
    hi = _sparsify(np.fft.ifft(ZetaCodec.to_zeta(b >> 4, 16)))
    lo = _sparsify(np.fft.ifft(ZetaCodec.to_zeta(b & 0x0F, 16)))
    return hi, lo


@functools.lru_cache(maxsize=None)
def zeta16_snap_coeffs() -> np.ndarray:
    """[16] complex: the L2-optimal "snap" polynomial over the mirrored
    zeta16 basis — which is provably just c1*x with c1 = sinc(pi/16).

    The snapped-phase target exp(i*snap_16(theta)) has Fourier support only
    at harmonics k = 1 mod 16; the degree-(<=15) mirrored basis spans
    k in [-7, 8], so the projection keeps only k=1 with coefficient
    (1/2pi) int exp(i(snap(t)-t)) dt = sin(pi/16)/(pi/16) ~ 0.993587.
    This is the *exact closed form* of what the reference's ill-conditioned
    8192-sample ridge fit approximated (c1 ~ 0.9936,
    gen/make_zeta16_snap_coeffs.py:11-35; SURVEY.md C21) — and the spectral
    proof of why that fit had to degenerate to near-identity.  Genuine
    snapping needs the x^17 harmonic (see aes/ops.py Snap)."""
    c = np.zeros(16, np.complex128)
    c[1] = np.sin(np.pi / 16) / (np.pi / 16)
    return c


@functools.lru_cache(maxsize=None)
def lift16_to_256_coeffs() -> np.ndarray:
    """[16] complex: maps zeta16^v -> zeta256^v (reference:
    sub_bytes_lut.py:38-44)."""
    z256 = np.exp(-2j * np.pi / 256)
    vals = z256 ** np.arange(16)
    return _sparsify(np.fft.ifft(vals))


# ---------------------------------------------------------------------------
# exhaustive verification (exact phase-decode on every input)
# ---------------------------------------------------------------------------

def verify_bivariate_16(coeffs: np.ndarray, truth) -> bool:
    """truth(p, q) -> int nibble; checks all 256 inputs decode exactly."""
    z = ZetaCodec.to_zeta(np.arange(16), 16)
    xp = z[:, None] ** np.arange(16)[None, :]       # [16 val, 16 pow]
    vals = np.einsum("ap,bq,pq->ab", xp, xp, coeffs)
    dec = ZetaCodec.from_zeta(vals, 16)
    want = np.array([[truth(p, q) for q in range(16)] for p in range(16)])
    return bool(np.array_equal(dec, want))


def verify_univariate_256(coeffs: np.ndarray, truth) -> bool:
    z = np.exp(-2j * np.pi / 256) ** np.arange(256)
    powers = z[:, None] ** np.arange(256)[None, :]
    vals = powers @ coeffs
    dec = ZetaCodec.from_zeta(vals, 16)
    want = np.array([truth(b) for b in range(256)])
    return bool(np.array_equal(dec, want))
