"""Canonical-embedding encoder/decoder (the CKKS "slot FFT").

Replaces the reference engine's opaque ``encode``/``decode`` verbs
(reference: engine_context.py:56-63).  Slots are complex values at the odd
primitive 2N-th roots of unity, ordered by the cyclic generator 5:

    slot j  <->  evaluation of m(X) at  omega^{e_j},  e_j = 5^j mod 2N,

with omega = exp(-2*pi*i/2N); the conjugate points carry conj(values), making
the coefficient vector real.  Both directions reduce to one length-N complex
FFT via the substitution g_k = m_k * omega^k:

    m(omega^{2s+1}) = FFT_N(g)[s].

Encoding/decoding are *host* operations (numpy, exact big-int residue
arithmetic); they sit outside every benchmark hot path, exactly as the
reference's encode/decrypt do.  Plaintext *constants* take a closed-form
2-coefficient fast path (a + b*X^{N/2} is constant across the e_j = 1 mod 4
slot points) — see CkksContext.encode_const.
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

from ..params import CkksParams

__all__ = ["Encoder"]


class Encoder:
    def __init__(self, params: CkksParams):
        self.params = params
        n = params.n
        two_n = params.two_n
        n_slots = params.n_slots
        # slot j -> fft bin s_j and its conjugate bin.
        e = 1
        pos = np.empty(n_slots, np.int64)
        cpos = np.empty(n_slots, np.int64)
        for j in range(n_slots):
            pos[j] = (e - 1) // 2
            cpos[j] = (two_n - e - 1) // 2
            e = (e * 5) % two_n
        self._pos = pos
        self._cpos = cpos
        k = np.arange(n)
        self._omega_k = np.exp(-2j * np.pi * k / two_n)       # omega^k
        self._omega_mk = np.conj(self._omega_k)               # omega^-k

    # ------------------------------------------------------------------
    # values <-> real coefficient vector
    # ------------------------------------------------------------------
    def values_to_coeffs(self, values: np.ndarray, scale: Fraction) -> np.ndarray:
        """Complex slot values [n_slots] -> rounded integer coefficients [N]
        (int64 when they fit, else object/bigint)."""
        p = self.params
        full = np.zeros(p.n, np.complex128)
        full[self._pos] = values
        full[self._cpos] = np.conj(values)
        g = np.fft.ifft(full)
        m = (g * self._omega_mk).real * float(scale)
        if np.max(np.abs(m)) < 2**62:
            return np.rint(m).astype(np.int64)
        return np.array([int(round(x)) for x in m], dtype=object)

    def coeffs_to_values(self, coeffs_over_scale: np.ndarray) -> np.ndarray:
        """Real coefficient vector (already divided by scale) -> slot values."""
        g = coeffs_over_scale * self._omega_k
        full = np.fft.fft(g)
        return full[self._pos]

    # ------------------------------------------------------------------
    # integer coefficients <-> RNS residues
    # ------------------------------------------------------------------
    def to_residues(self, coeffs: np.ndarray, primes) -> np.ndarray:
        """Signed integer coefficients [N] -> u32 residues [l, N]."""
        out = np.empty((len(primes), len(coeffs)), np.uint32)
        if coeffs.dtype == np.int64:
            for i, q in enumerate(primes):
                out[i] = (coeffs % q).astype(np.uint32)
        else:
            for i, q in enumerate(primes):
                out[i] = np.array([c % q for c in coeffs], dtype=np.uint32)
        return out

    def crt_centered(self, residues: np.ndarray, primes) -> np.ndarray:
        """Exact CRT lift of u32 residues [l, N] to centered big ints [N]
        (object dtype).  Host-side; the C++ codec will replace this."""
        primes = list(primes)
        Q = 1
        for q in primes:
            Q *= q
        acc = np.zeros(residues.shape[-1], dtype=object)
        for i, q in enumerate(primes):
            qhat = Q // q
            w = qhat * (pow(qhat, -1, q) % q)
            acc += residues[i].astype(object) * w
        acc %= Q
        half = Q // 2
        return np.where(acc > half, acc - Q, acc)

    def residues_to_values(
        self, residues: np.ndarray, primes, scale: Fraction
    ) -> np.ndarray:
        from ..native import crt_centered_to_double

        m = crt_centered_to_double(residues, primes, float(1 / scale))
        if m is None:  # pure-Python fallback
            centered = self.crt_centered(residues, primes)
            inv = 1.0 / scale
            m = np.array([float(Fraction(int(c)) * inv) for c in centered])
        return self.coeffs_to_values(m)
