"""RNS base conversion, rescaling, and mod-down — host tables + device ops.

These are the residue-system plumbing verbs behind every CKKS multiply,
key-switch and rescale (the reference engine hid them inside desilofhe's
``multiply``/``relinearize``/``rescale``; SURVEY.md section 2.2).  All device
functions are pure vectorized jnp over u32 arrays shaped [..., L, N] and
operate in the *coefficient* domain unless noted.

Fast (approximate) base conversion follows the standard HEAAN/SEAL recipe:

    Conv_{B->c}(x) = sum_i [x_i * (B/b_i)^{-1}]_{b_i} * (B/b_i)  mod c

which reconstructs x + alpha*B for a small alpha < |B| — the overshoot is
absorbed by the key-switch special modulus / rescale noise budget.  Rescaling
is an exact centered single-prime drop (implemented in ckks/context.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp

from .modular import add_mod, sub_mod, mont_mul, barrett_reduce

__all__ = [
    "ConvTables",
    "make_conv_tables",
    "base_convert",
    "base_convert_centered",
]

_R = 1 << 32


@dataclass(frozen=True)
class ConvTables:
    """Device constants for one fixed (source primes -> target primes) pair.

    ghat_inv : [m]     ((B/b_i)^{-1} mod b_i) * R   (Montgomery form)
    ghat_mod : [m, T]  ((B/b_i) mod c_t) * R        (Montgomery form)
    src_q, src_qinv : [m]   source primes and -q^{-1} mod 2^32
    tgt_q, tgt_qinv : [T]   target primes and -q^{-1} mod 2^32
    g_digits : [4, m, T] bf16  8-bit digit planes of (B/b_i) mod c_t
                               (STANDARD form) for the MXU matmul path
    pow8_mont: [7, T]   (2^{8s} mod c_t) * R  digit-recombination constants
    """

    ghat_inv: jnp.ndarray
    ghat_mod: jnp.ndarray
    src_q: jnp.ndarray
    src_qinv: jnp.ndarray
    tgt_q: jnp.ndarray
    tgt_qinv: jnp.ndarray
    b_mod: jnp.ndarray       # [T] (B mod c_t) * R  (for the centered variant)
    g_digits: jnp.ndarray
    pow8_mont: jnp.ndarray


def make_conv_tables(src: tuple[int, ...], tgt: tuple[int, ...]) -> ConvTables:
    """Host-exact table construction (Python big ints)."""
    B = math.prod(src)
    m, T = len(src), len(tgt)
    ghat_inv = np.empty(m, np.uint32)
    ghat_mod = np.empty((m, T), np.uint32)
    g_std = np.empty((m, T), np.uint64)
    for i, b in enumerate(src):
        bhat = B // b
        ghat_inv[i] = pow(bhat, -1, b) * _R % b
        for t, c in enumerate(tgt):
            ghat_mod[i, t] = bhat % c * _R % c
            g_std[i, t] = bhat % c
    # 8-bit digits are exact in bfloat16 (8 significand bits cover 0..255)
    g_digits = np.stack(
        [((g_std >> (8 * k)) & 0xFF).astype(np.float32) for k in range(4)]
    ).astype(jnp.bfloat16)
    pow8_mont = np.empty((7, T), np.uint32)
    for s in range(7):
        for t, c in enumerate(tgt):
            pow8_mont[s, t] = (1 << (8 * s)) * _R % c
    u32 = lambda xs: np.asarray(xs, np.uint32)
    neg_inv = lambda ps: u32([(-pow(p, -1, _R)) % _R for p in ps])
    # numpy on purpose: these tables are lru-cached by callers and may be
    # first materialized inside a jit trace — numpy constants are trace-safe,
    # jnp ops there would leak tracers.
    return ConvTables(
        ghat_inv=ghat_inv,
        ghat_mod=ghat_mod,
        src_q=u32(src),
        src_qinv=neg_inv(src),
        tgt_q=u32(tgt),
        tgt_qinv=neg_inv(tgt),
        b_mod=u32([B % c * _R % c for c in tgt]),
        g_digits=g_digits,
        pow8_mont=pow8_mont,
    )


# Above this source count the conversion runs as MXU digit matmuls; below,
# as the direct per-source multiply-accumulate loop (cheaper for tiny m).
_MATMUL_MIN_M = 6
# f32 accumulation is exact below 2^24; partial sums reach 255*255*m*4.
_MATMUL_MAX_M = 64


def _conv_matmul(
    y: jnp.ndarray, t: ConvTables, plane_dtype=None
) -> jnp.ndarray:
    """sum_i y[..., i, n] * g[i, t] mod c_t as MXU digit matmuls.

    Both operands split into 8-bit digit planes (exact in bf16); the 4x4
    digit products group into 7 shift classes, each one [T, m] @ [m, N]
    matmul with exact f32 accumulation (sums < 2^24 for m <= 64); the
    classes recombine with one Montgomery multiply by 2^{8s} each — ~7
    VPU mults per output instead of m (reference conv loop cost).
    """
    tq = t.tgt_q[:, None]
    tqi = t.tgt_qinv[:, None]
    # bf16 planes feed the MXU on TPU; XLA:CPU's thunk runtime cannot
    # execute batched BF16xBF16=F32 dots (hit by the SPMD-partitioned
    # dryrun), so off-TPU the planes ride f32 — identical values (8-bit
    # digits are exact in either type), identical results.  Callers that
    # know their target backend (CkksContext resolves it once at
    # construction) thread ``plane_dtype`` explicitly; the process-global
    # default is only a fallback (it is wrong for e.g. a CPU-pinned jit in
    # a TPU-default process — round-2 advisor finding).
    plane_t = plane_dtype
    if plane_t is None:
        try:
            plane_t = (
                jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
            )
        except Exception:
            plane_t = jnp.float32
    y_digits = [
        ((y >> (8 * k)) & 0xFF).astype(plane_t) for k in range(4)
    ]
    g = t.g_digits.astype(plane_t)  # [4, m, T] standard-form digits
    acc = None
    for s in range(7):
        p_s = None
        for k in range(max(0, s - 3), min(4, s + 1)):
            j = s - k
            part = jnp.einsum(
                "mt,...mn->...tn",
                g[j],
                y_digits[k],
                preferred_element_type=jnp.float32,
            )
            p_s = part if p_s is None else p_s + part
        term = mont_mul(
            p_s.astype(jnp.uint32), t.pow8_mont[s][:, None], tq, tqi
        )
        acc = term if acc is None else add_mod(acc, term, tq)
    return acc


def base_convert(
    x: jnp.ndarray, t: ConvTables, plane_dtype=None
) -> jnp.ndarray:
    """Fast base conversion, coefficient domain.

    x: u32 [..., m, N] residues for the source primes; returns [..., T, N]
    residues for the target primes (value + alpha*B overshoot, alpha < m).
    """
    m = x.shape[-2]
    y = mont_mul(
        x,
        t.ghat_inv[:, None],
        t.src_q[:, None],
        t.src_qinv[:, None],
    )  # [..., m, N] : [x_i * (B/b_i)^{-1}]_{b_i}
    if _MATMUL_MIN_M <= m <= _MATMUL_MAX_M:
        return _conv_matmul(y, t, plane_dtype)
    tq = t.tgt_q[:, None]
    tqi = t.tgt_qinv[:, None]
    acc = None
    for i in range(m):
        # y_i may exceed a target prime; Montgomery REDC still returns the
        # exact product mod c because t_hi < c (both factors < 2^31).
        term = mont_mul(y[..., i : i + 1, :], t.ghat_mod[i][:, None], tq, tqi)
        acc = term if acc is None else add_mod(acc, term, tq)
    return acc


def base_convert_centered(
    x: jnp.ndarray, t: ConvTables, plane_dtype=None
) -> jnp.ndarray:
    """Exact-overshoot base conversion with centering (BEHZ-style).

    The plain fast conversion returns x + alpha*B with alpha = floor(sum_i
    y_i/b_i); estimating round(sum y_i/b_i) in float and subtracting that
    many B yields the *centered* representative in [-B/2, B/2) — the variant
    bootstrapping's ModRaise needs to keep the EvalMod range budget tight.
    A coefficient within float-epsilon of the +-B/2 boundary may land one B
    off, which EvalMod's periodicity absorbs.
    """
    m = x.shape[-2]
    y = mont_mul(
        x, t.ghat_inv[:, None], t.src_q[:, None], t.src_qinv[:, None]
    )
    tq = t.tgt_q[:, None]
    tqi = t.tgt_qinv[:, None]
    if _MATMUL_MIN_M <= m <= _MATMUL_MAX_M:
        acc = _conv_matmul(y, t, plane_dtype)
        af = jnp.sum(
            y.astype(jnp.float32)
            / np.asarray(t.src_q, np.float32)[:, None],
            axis=-2,
            keepdims=True,
        )
    else:
        acc = None
        af = None
        for i in range(m):
            term = mont_mul(
                y[..., i : i + 1, :], t.ghat_mod[i][:, None], tq, tqi
            )
            acc = term if acc is None else add_mod(acc, term, tq)
            f = y[..., i : i + 1, :].astype(jnp.float32) / np.float32(
                int(t.src_q[i])
            )
            af = f if af is None else af + f
    corr = jnp.round(af).astype(jnp.uint32)      # [..., 1, N]
    corr_b = mont_mul(corr, t.b_mod[:, None], tq, tqi)
    return sub_mod(acc, corr_b, tq)
