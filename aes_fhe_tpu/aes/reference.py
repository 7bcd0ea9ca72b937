"""Plain NumPy AES-128 references (golden models for differential tests).

The reference embedded per-module plaintext implementations in its harnesses
(shift_rows.py:67-72, mixcol_final.py:169-221, invmixcolumns_fhe.py:174-226,
test/test_aes_pipeline_roundtrip.py:49-110); here they are one canonical
module.  State layout is column-first (GHS12): linear index r + 4c
(reference: README.md:103-109)."""

from __future__ import annotations

import numpy as np

__all__ = [
    "SBOX",
    "INV_SBOX",
    "sub_bytes",
    "inv_sub_bytes",
    "shift_rows",
    "inv_shift_rows",
    "mix_columns",
    "inv_mix_columns",
    "add_round_key",
    "expand_aes128_key",
    "aes128_encrypt_state",
    "aes128_decrypt_state",
    "gf_mul",
]

SBOX = np.array(
    [
        0x63, 0x7C, 0x77, 0x7B, 0xF2, 0x6B, 0x6F, 0xC5, 0x30, 0x01, 0x67, 0x2B, 0xFE, 0xD7, 0xAB, 0x76,
        0xCA, 0x82, 0xC9, 0x7D, 0xFA, 0x59, 0x47, 0xF0, 0xAD, 0xD4, 0xA2, 0xAF, 0x9C, 0xA4, 0x72, 0xC0,
        0xB7, 0xFD, 0x93, 0x26, 0x36, 0x3F, 0xF7, 0xCC, 0x34, 0xA5, 0xE5, 0xF1, 0x71, 0xD8, 0x31, 0x15,
        0x04, 0xC7, 0x23, 0xC3, 0x18, 0x96, 0x05, 0x9A, 0x07, 0x12, 0x80, 0xE2, 0xEB, 0x27, 0xB2, 0x75,
        0x09, 0x83, 0x2C, 0x1A, 0x1B, 0x6E, 0x5A, 0xA0, 0x52, 0x3B, 0xD6, 0xB3, 0x29, 0xE3, 0x2F, 0x84,
        0x53, 0xD1, 0x00, 0xED, 0x20, 0xFC, 0xB1, 0x5B, 0x6A, 0xCB, 0xBE, 0x39, 0x4A, 0x4C, 0x58, 0xCF,
        0xD0, 0xEF, 0xAA, 0xFB, 0x43, 0x4D, 0x33, 0x85, 0x45, 0xF9, 0x02, 0x7F, 0x50, 0x3C, 0x9F, 0xA8,
        0x51, 0xA3, 0x40, 0x8F, 0x92, 0x9D, 0x38, 0xF5, 0xBC, 0xB6, 0xDA, 0x21, 0x10, 0xFF, 0xF3, 0xD2,
        0xCD, 0x0C, 0x13, 0xEC, 0x5F, 0x97, 0x44, 0x17, 0xC4, 0xA7, 0x7E, 0x3D, 0x64, 0x5D, 0x19, 0x73,
        0x60, 0x81, 0x4F, 0xDC, 0x22, 0x2A, 0x90, 0x88, 0x46, 0xEE, 0xB8, 0x14, 0xDE, 0x5E, 0x0B, 0xDB,
        0xE0, 0x32, 0x3A, 0x0A, 0x49, 0x06, 0x24, 0x5C, 0xC2, 0xD3, 0xAC, 0x62, 0x91, 0x95, 0xE4, 0x79,
        0xE7, 0xC8, 0x37, 0x6D, 0x8D, 0xD5, 0x4E, 0xA9, 0x6C, 0x56, 0xF4, 0xEA, 0x65, 0x7A, 0xAE, 0x08,
        0xBA, 0x78, 0x25, 0x2E, 0x1C, 0xA6, 0xB4, 0xC6, 0xE8, 0xDD, 0x74, 0x1F, 0x4B, 0xBD, 0x8B, 0x8A,
        0x70, 0x3E, 0xB5, 0x66, 0x48, 0x03, 0xF6, 0x0E, 0x61, 0x35, 0x57, 0xB9, 0x86, 0xC1, 0x1D, 0x9E,
        0xE1, 0xF8, 0x98, 0x11, 0x69, 0xD9, 0x8E, 0x94, 0x9B, 0x1E, 0x87, 0xE9, 0xCE, 0x55, 0x28, 0xDF,
        0x8C, 0xA1, 0x89, 0x0D, 0xBF, 0xE6, 0x42, 0x68, 0x41, 0x99, 0x2D, 0x0F, 0xB0, 0x54, 0xBB, 0x16,
    ],
    dtype=np.uint8,
)

INV_SBOX = np.zeros(256, np.uint8)
INV_SBOX[SBOX] = np.arange(256, dtype=np.uint8)

RCON = np.array([0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36], np.uint8)


def gf_mul(a: int, b: int) -> int:
    """GF(2^8) multiply, AES polynomial x^8+x^4+x^3+x+1 (0x11B)."""
    r = 0
    a &= 0xFF
    while b:
        if b & 1:
            r ^= a
        hi = a & 0x80
        a = (a << 1) & 0xFF
        if hi:
            a ^= 0x1B
        b >>= 1
    return r


def _to_matrix(state16: np.ndarray) -> np.ndarray:
    return np.asarray(state16, np.uint8).reshape(4, 4, order="F")


def _from_matrix(m: np.ndarray) -> np.ndarray:
    return np.asarray(m, np.uint8).reshape(16, order="F")


def sub_bytes(state16):
    return SBOX[np.asarray(state16, np.uint8)]


def inv_sub_bytes(state16):
    return INV_SBOX[np.asarray(state16, np.uint8)]


def shift_rows(state16):
    m = _to_matrix(state16).copy()
    for r in range(4):
        m[r] = np.roll(m[r], -r)
    return _from_matrix(m)


def inv_shift_rows(state16):
    m = _to_matrix(state16).copy()
    for r in range(4):
        m[r] = np.roll(m[r], r)
    return _from_matrix(m)


def _mix_single_column(col, mat):
    out = np.zeros(4, np.uint8)
    for r in range(4):
        acc = 0
        for c in range(4):
            acc ^= gf_mul(int(col[c]), int(mat[r][c]))
        out[r] = acc
    return out


_MC = [[2, 3, 1, 1], [1, 2, 3, 1], [1, 1, 2, 3], [3, 1, 1, 2]]
_IMC = [[14, 11, 13, 9], [9, 14, 11, 13], [13, 9, 14, 11], [11, 13, 9, 14]]


def mix_columns(state16):
    m = _to_matrix(state16)
    out = np.empty_like(m)
    for c in range(4):
        out[:, c] = _mix_single_column(m[:, c], _MC)
    return _from_matrix(out)


def inv_mix_columns(state16):
    m = _to_matrix(state16)
    out = np.empty_like(m)
    for c in range(4):
        out[:, c] = _mix_single_column(m[:, c], _IMC)
    return _from_matrix(out)


def add_round_key(state16, rk16):
    return np.bitwise_xor(np.asarray(state16, np.uint8), np.asarray(rk16, np.uint8))


def expand_aes128_key(key16: np.ndarray) -> list[np.ndarray]:
    """Plaintext AES-128 key schedule -> 11 round keys of 16 bytes each
    (column-first byte order, same trust model as the reference:
    test/test_aes_pipeline_roundtrip.py:95-110)."""
    key = np.asarray(key16, np.uint8)
    assert key.shape == (16,)
    words = [key[4 * i : 4 * i + 4].copy() for i in range(4)]
    for i in range(4, 44):
        tmp = words[i - 1].copy()
        if i % 4 == 0:
            tmp = np.roll(tmp, -1)
            tmp = SBOX[tmp]
            tmp[0] ^= RCON[i // 4 - 1]
        words.append(words[i - 4] ^ tmp)
    return [np.concatenate(words[4 * r : 4 * r + 4]) for r in range(11)]


def aes128_encrypt_state(state16, round_keys):
    s = add_round_key(state16, round_keys[0])
    for r in range(1, 10):
        s = add_round_key(mix_columns(shift_rows(sub_bytes(s))), round_keys[r])
    return add_round_key(shift_rows(sub_bytes(s)), round_keys[10])


def aes128_decrypt_state(state16, round_keys):
    s = add_round_key(state16, round_keys[10])
    for r in range(9, 0, -1):
        # correct inverse order (fixes reference quirk Q1, SURVEY.md 2.3):
        # ISR -> ISB -> ARK -> IMC
        s = inv_mix_columns(
            add_round_key(inv_sub_bytes(inv_shift_rows(s)), round_keys[r])
        )
    return add_round_key(inv_sub_bytes(inv_shift_rows(s)), round_keys[0])
