"""Native (C++) host codec, loaded via ctypes with a pure-Python fallback.

Builds libcrtcodec.so with g++ on first use (cached next to the source);
``crt_centered_to_double`` replaces the numpy-object big-int CRT in the
decode path (ckks/encoder.py) — the equivalent of the reference's native
engine decode (engine_context.py:59-63), ~20x faster than Python big ints.
"""

from __future__ import annotations

import ctypes
import math
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["crt_centered_to_double", "available"]

_HERE = Path(__file__).parent
_SO = _HERE / "libcrtcodec.so"
_LIB = None


def _build() -> bool:
    src = _HERE / "crt_codec.cpp"
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(_SO)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return True
    except Exception:
        return False


def _load():
    global _LIB
    if _LIB is not None:
        return _LIB
    if not _SO.exists() or _SO.stat().st_mtime < (_HERE / "crt_codec.cpp").stat().st_mtime:
        if not _build():
            _LIB = False
            return False
    try:
        lib = ctypes.CDLL(str(_SO))
        lib.crt_centered_to_double.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.c_double,
            ctypes.POINTER(ctypes.c_double),
        ]
        lib.crt_centered_to_double.restype = None
        _LIB = lib
    except OSError:
        _LIB = False
    return _LIB


def available() -> bool:
    return bool(_load())


def _to_limbs(x: int, n_limbs: int) -> np.ndarray:
    out = np.zeros(n_limbs, np.uint64)
    for i in range(n_limbs):
        out[i] = x & 0xFFFFFFFFFFFFFFFF
        x >>= 64
    assert x == 0
    return out


_tables_cache: dict[tuple[int, ...], tuple] = {}


def _tables(primes: tuple[int, ...]):
    if primes not in _tables_cache:
        Q = math.prod(primes)
        nq = (Q.bit_length() + 63) // 64 + 1
        w = np.zeros((len(primes), nq), np.uint64)
        for i, q in enumerate(primes):
            qhat = Q // q
            wi = qhat * pow(qhat, -1, q) % Q
            w[i] = _to_limbs(wi, nq)
        q_l = _to_limbs(Q, nq)
        half = _to_limbs(Q // 2, nq)
        _tables_cache[primes] = (w, q_l, half, nq)
    return _tables_cache[primes]


def crt_centered_to_double(
    residues: np.ndarray, primes, inv_scale: float
) -> np.ndarray | None:
    """residues u32 [L, N] -> centered big-int value * inv_scale, as f64 [N].
    Returns None if the native library is unavailable."""
    lib = _load()
    if not lib:
        return None
    primes = tuple(int(q) for q in primes)
    w, q_l, half, nq = _tables(primes)
    res = np.ascontiguousarray(residues, np.uint32)
    L, N = res.shape
    out = np.empty(N, np.float64)
    lib.crt_centered_to_double(
        res.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        L,
        N,
        np.ascontiguousarray(w).ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        nq,
        q_l.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        half.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
        float(inv_scale),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
