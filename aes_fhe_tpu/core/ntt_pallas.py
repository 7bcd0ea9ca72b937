"""Fused negacyclic NTT as a Pallas TPU kernel.

The XLA path (core/ntt.py) materializes every butterfly stage through HBM;
this kernel keeps the whole logN-stage transform VMEM-resident, one
(poly, limb) row per grid step.

Lane-dimension strategy: the polynomial is viewed as an [R, C] matrix
(C = lanes, row-major flat order).  Early stages have butterfly distance
>= C, so partners differ only in the row index — pure sublane reshapes.  The
remaining logC stages act inside rows; a single 2D transpose moves them onto
the sublane axis (a 2*half-aligned block never crosses a row, so partners in
the transposed view differ only in the new row index).  A final transpose
restores the standard layout, making the kernel a BIT-EXACT drop-in for
core.ntt.ntt / intt — identical butterfly order, identical Montgomery
arithmetic, same twiddle tables re-indexed per stage:

  phase-1 stage s (m = 2^s row-blocks):   tw = Psi[m + row_block]
  phase-2 stage s' (in transposed view):  tw[c_blk, q] = Psi[m_g + q*mc + c_blk]

Tables are built host-side from the same Montgomery-form Psi/PsiInv arrays.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modular import add_mod, sub_mod, mont_mul
from .ntt import NttTables

__all__ = ["PallasNttTables", "build_pallas_tables", "ntt_pl", "intt_pl"]


class PallasNttTables(NamedTuple):
    """Per-stage twiddle tables for the split/transpose kernel (numpy u32,
    Montgomery form), pre-expanded so every in-kernel reshape is a pure
    *sublane* regrouping (Mosaic cannot relayout lanes into sublanes).
    L = number of primes."""

    tw1: np.ndarray        # [L, S1, R//2, 1] fwd phase 1, expanded by row
    tw2: np.ndarray        # [L, S2, C//2, R] fwd phase 2, expanded by (ci, j)
    twi2: np.ndarray       # [L, S2, C//2, R] inv phase 1 (transposed view)
    twi1: np.ndarray       # [L, S1, R//2, 1] inv phase 2, expanded by row
    ninv: np.ndarray       # [L, 1] Montgomery N^-1
    q: np.ndarray          # [L, 1]
    q_neg_inv: np.ndarray  # [L, 1]
    logn: int
    lanes: int


def build_pallas_tables(t: NttTables, lanes: int = 128) -> PallasNttTables:
    """Re-index the standard Longa–Naehrig tables for the split kernel."""
    psi = np.asarray(t.psi)
    psi_inv = np.asarray(t.psi_inv)
    L, n = psi.shape
    logn = n.bit_length() - 1
    C = lanes
    R = n // C
    assert R >= 2 and C >= 2 and R * C == n
    S1 = logn - (C.bit_length() - 1)
    S2 = C.bit_length() - 1

    # phase 1, stage s: v has flat sublane shape (m, hr) -> store the block
    # twiddle psi[m + i] repeated hr times at rows i*hr + j.
    tw1 = np.zeros((L, S1, R // 2, 1), np.uint32)
    for s in range(S1):
        m = 1 << s
        hr = R >> (s + 1)
        tw1[:, s, :, 0] = np.repeat(psi[:, m : 2 * m], hr, axis=1)

    # phase 2 (transposed view), stage sp: v is (mc, hc, R) with hc=C>>(sp+1);
    # twiddle for (ci, q) is psi[m_g + q*mc + ci], identical across j < hc.
    tw2 = np.zeros((L, S2, C // 2, R), np.uint32)
    q_idx = np.arange(R)
    for sp in range(S2):
        mc = 1 << sp
        hc = C >> (sp + 1)
        m_g = R * mc
        for ci in range(mc):
            row = psi[:, m_g + q_idx * mc + ci]
            for j in range(hc):
                tw2[:, sp, ci * hc + j, :] = row

    twi2 = np.zeros((L, S2, C // 2, R), np.uint32)
    for s in range(S2):
        h = n >> (s + 1)
        mc = C >> (s + 1)
        half = 1 << s
        for ci in range(mc):
            row = psi_inv[:, h + q_idx * mc + ci]
            for j in range(half):
                twi2[:, s, ci * half + j, :] = row

    twi1 = np.zeros((L, S1, R // 2, 1), np.uint32)
    for j in range(S1):
        hb = R >> (j + 1)
        half = 1 << j
        twi1[:, j, :, 0] = np.repeat(psi_inv[:, hb : 2 * hb], half, axis=1)

    return PallasNttTables(
        tw1=tw1,
        tw2=tw2,
        twi2=twi2,
        twi1=twi1,
        ninv=np.asarray(t.ninv)[:, None],
        q=np.asarray(t.q)[:, None],
        q_neg_inv=np.asarray(t.q_neg_inv)[:, None],
        logn=logn,
        lanes=lanes,
    )


def _butterfly_merge(a, b, shape):
    return jnp.concatenate([a[:, None], b[:, None]], axis=1).reshape(shape)


def _fwd_kernel(x_ref, tw1_ref, tw2_ref, q_ref, qi_ref, o_ref, *, logn, lanes, L):
    n = 1 << logn
    C = lanes
    R = n // C
    S1 = logn - (C.bit_length() - 1)
    S2 = C.bit_length() - 1
    limb = jax.lax.rem(pl.program_id(0), L)
    q = q_ref[limb, 0]
    qi = qi_ref[limb, 0]
    x = x_ref[0]  # [R, C]

    for s in range(S1):
        m = 1 << s
        hr = R >> (s + 1)
        xs = x.reshape(m, 2, hr, C)
        u, v = xs[:, 0], xs[:, 1]
        tw = tw1_ref[0, s].reshape(m, hr, 1)   # sublane-only regroup
        vs = mont_mul(v, tw, q, qi)
        x = _butterfly_merge(add_mod(u, vs, q), sub_mod(u, vs, q), (R, C))

    y = jnp.transpose(x)  # [C, R]
    for sp in range(S2):
        mc = 1 << sp
        hc = C >> (sp + 1)
        ys = y.reshape(mc, 2, hc, R)
        u, v = ys[:, 0], ys[:, 1]
        tw = tw2_ref[0, sp].reshape(mc, hc, R)  # sublane-only regroup
        vs = mont_mul(v, tw, q, qi)
        y = _butterfly_merge(add_mod(u, vs, q), sub_mod(u, vs, q), (C, R))

    o_ref[0] = jnp.transpose(y)


def _inv_kernel(
    x_ref, twi2_ref, twi1_ref, ninv_ref, q_ref, qi_ref, o_ref, *, logn, lanes, L
):
    n = 1 << logn
    C = lanes
    R = n // C
    S1 = logn - (C.bit_length() - 1)
    S2 = C.bit_length() - 1
    limb = jax.lax.rem(pl.program_id(0), L)
    q = q_ref[limb, 0]
    qi = qi_ref[limb, 0]
    ninv = ninv_ref[limb, 0]

    y = jnp.transpose(x_ref[0])  # [C, R]
    for s in range(S2):
        half = 1 << s
        mc = C >> (s + 1)
        ys = y.reshape(mc, 2, half, R)
        u, v = ys[:, 0], ys[:, 1]
        tw = twi2_ref[0, s].reshape(mc, half, R)  # sublane-only regroup
        y = _butterfly_merge(
            add_mod(u, v, q),
            mont_mul(sub_mod(u, v, q), tw, q, qi),
            (C, R),
        )

    x = jnp.transpose(y)  # [R, C]
    for j in range(S1):
        hb = R >> (j + 1)
        half = 1 << j
        xs = x.reshape(hb, 2, half, C)
        u, v = xs[:, 0], xs[:, 1]
        tw = twi1_ref[0, j].reshape(hb, half, 1)  # sublane-only regroup
        x = _butterfly_merge(
            add_mod(u, v, q),
            mont_mul(sub_mod(u, v, q), tw, q, qi),
            (R, C),
        )

    o_ref[0] = mont_mul(x, ninv, q, qi)


def _call(kernel, x, tabs, scalars, t: PallasNttTables, interpret: bool):
    """x: u32 [..., L, N]; tabs: per-limb table operands (blocked by limb);
    scalars: [L, 1] u32 arrays passed whole in SMEM, indexed in-kernel."""
    L = x.shape[-2]
    n = x.shape[-1]
    C = t.lanes
    R = n // C
    lead = x.shape[:-2]
    g_lead = int(np.prod(lead)) if lead else 1
    xg = x.reshape(g_lead * L, R, C)

    in_specs = [pl.BlockSpec((1, R, C), lambda g: (g, 0, 0))]
    ins = [xg]
    for tab in tabs:
        nd = tab.ndim
        in_specs.append(
            pl.BlockSpec(
                (1,) + tab.shape[1:],
                functools.partial(
                    lambda g, _nd: (g % L,) + (0,) * (_nd - 1), _nd=nd
                ),
            )
        )
        ins.append(tab)
    for arr in scalars:
        # whole [L, 1] array in SMEM; the kernel indexes it by program_id % L
        in_specs.append(
            pl.BlockSpec(arr.shape, lambda g: (0, 0), memory_space=pltpu.SMEM)
        )
        ins.append(arr)

    out = pl.pallas_call(
        functools.partial(kernel, logn=t.logn, lanes=t.lanes, L=L),
        out_shape=jax.ShapeDtypeStruct((g_lead * L, R, C), jnp.uint32),
        grid=(g_lead * L,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, R, C), lambda g: (g, 0, 0)),
        interpret=interpret,
    )(*ins)
    return out.reshape(*lead, L, n)


def ntt_pl(x, t: PallasNttTables, interpret: bool = False):
    """Forward negacyclic NTT, bit-identical to core.ntt.ntt."""
    return _call(
        _fwd_kernel, x, [t.tw1, t.tw2], [t.q, t.q_neg_inv], t, interpret
    )


def intt_pl(x, t: PallasNttTables, interpret: bool = False):
    """Inverse negacyclic NTT, bit-identical to core.ntt.intt."""
    return _call(
        _inv_kernel,
        x,
        [t.twi2, t.twi1],
        [t.ninv, t.q, t.q_neg_inv],
        t,
        interpret,
    )
