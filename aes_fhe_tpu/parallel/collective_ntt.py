"""Mesh-sharded negacyclic NTT over the polynomial-coefficient axis.

The FHE analog of sequence/context parallelism (SURVEY.md section 2.4): the
N-point transform is too large for one device only in the multi-host regime,
and its butterfly stages are the all-to-all communication structure that ring
attention has in transformers.  This implements the classic two-phase
split-transpose factorization *distributed*:

  view x as an [R, C] matrix (row-major).  Phase-1 stages have butterfly
  distance >= C, so partners differ only in the ROW index: with the
  coefficient axis sharded by COLUMNS, phase 1 is device-local.  One
  distributed transpose (jax.lax.all_to_all) re-shards by rows, making the
  remaining logC stages local too.  A second all_to_all restores the
  canonical column sharding.

The twiddle layout is exactly core.ntt_pallas.build_pallas_tables — phase-1
twiddles are column-independent (shard-invariant), phase-2 twiddles are
sliced per device by its global row block.  Results are BIT-IDENTICAL to
core.ntt.ntt / intt (same butterfly order, same Montgomery arithmetic).

Intended composition: batch/limb axes shard over dp/tp as usual
(parallel/mesh.py); this module adds the third, "sp" axis for the regime
where a single ciphertext's coefficients span devices.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.modular import add_mod, sub_mod, mont_mul
from ..core.ntt_pallas import PallasNttTables, build_pallas_tables

__all__ = ["CollectiveNtt"]


def _merge(a, b, axis: int):
    """Interleave butterfly outputs along ``axis`` (the 2-way stack of
    core.ntt's jnp.stack(..., axis=-2).reshape)."""
    return jnp.stack([a, b], axis=axis)


class CollectiveNtt:
    """Forward/inverse negacyclic NTT with the coefficient axis sharded
    across a named mesh axis.

    Layout contract: x is u32 [..., L, N] with N sharded on its last axis
    (column sharding of the [R, C] view — the natural contiguous shard of
    the row-major flat order is by R, so we DEFINE the sharded axis as C by
    viewing x as [..., R, C] with C = lanes * shards; each device holds
    [..., R, C/D]).
    """

    def __init__(self, tables: PallasNttTables, mesh: Mesh, axis: str = "sp"):
        self.t = tables
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        n = 1 << tables.logn
        self.C = tables.lanes
        self.R = n // self.C
        assert self.C % self.D == 0 and self.R % self.D == 0, (
            self.C,
            self.R,
            self.D,
        )

    # -- device-local phase kernels ------------------------------------
    def _phase1_fwd(self, x, tw1, q, qi):
        """x: [L, R, Cd]; stages with butterfly distance >= C (row axis)."""
        L, R, Cd = x.shape
        S1 = tw1.shape[1]
        for s in range(S1):
            m = 1 << s
            hr = R >> (s + 1)
            xs = x.reshape(L, m, 2, hr, Cd)
            u, v = xs[:, :, 0], xs[:, :, 1]
            tw = tw1[:, s].reshape(L, m, hr, 1)
            vs = mont_mul(v, tw, q[:, None, None, None], qi[:, None, None, None])
            qb = q[:, None, None, None]
            x = _merge(add_mod(u, vs, qb), sub_mod(u, vs, qb), 2).reshape(
                L, R, Cd
            )
        return x

    def _phase2_fwd(self, y, tw2_loc, q, qi):
        """y: [L, Rd, C] (this device's global row block); stages along C."""
        L, Rd, C = y.shape
        S2 = tw2_loc.shape[1]
        for sp in range(S2):
            mc = 1 << sp
            hc = C >> (sp + 1)
            ys = y.reshape(L, Rd, mc, 2, hc)
            u, v = ys[:, :, :, 0], ys[:, :, :, 1]
            # tw2_loc [L, S2, C//2, Rd] -> [L, Rd, mc, hc]
            tw = jnp.moveaxis(tw2_loc[:, sp], -1, 1).reshape(L, Rd, mc, hc)
            qb = q[:, None, None, None]
            vs = mont_mul(v, tw, qb, qi[:, None, None, None])
            y = _merge(add_mod(u, vs, qb), sub_mod(u, vs, qb), 3).reshape(
                L, Rd, C
            )
        return y

    def _phase2_inv(self, y, twi2_loc, q, qi):
        L, Rd, C = y.shape
        S2 = twi2_loc.shape[1]
        for s in range(S2):
            half = 1 << s
            mc = C >> (s + 1)
            ys = y.reshape(L, Rd, mc, 2, half)
            u, v = ys[:, :, :, 0], ys[:, :, :, 1]
            tw = jnp.moveaxis(twi2_loc[:, s], -1, 1).reshape(L, Rd, mc, half)
            qb = q[:, None, None, None]
            y = _merge(
                add_mod(u, v, qb),
                mont_mul(sub_mod(u, v, qb), tw, qb, qi[:, None, None, None]),
                3,
            ).reshape(L, Rd, C)
        return y

    def _phase1_inv(self, x, twi1, ninv, q, qi, scale_ninv: bool):
        L, R, Cd = x.shape
        S1 = twi1.shape[1]
        for j in range(S1):
            hb = R >> (j + 1)
            half = 1 << j
            xs = x.reshape(L, hb, 2, half, Cd)
            u, v = xs[:, :, 0], xs[:, :, 1]
            tw = twi1[:, j].reshape(L, hb, half, 1)
            qb = q[:, None, None, None]
            x = _merge(
                add_mod(u, v, qb),
                mont_mul(sub_mod(u, v, qb), tw, qb, qi[:, None, None, None]),
                2,
            ).reshape(L, R, Cd)
        if scale_ninv:
            x = mont_mul(x, ninv[:, None, None], q[:, None, None], qi[:, None, None])
        return x

    # -- sharded entry points ------------------------------------------
    def _specs(self):
        # x [..., L, R, C] sharded on C
        return P(None, None, "sp")

    def ntt(self, x: jnp.ndarray) -> jnp.ndarray:
        """x u32 [L, N] (natural order), N sharded; returns bit-reversed
        evaluation order, same sharding."""
        t = self.t
        L = x.shape[0]
        D, R, C = self.D, self.R, self.C
        tw1 = jnp.asarray(t.tw1[:L])
        tw2 = jnp.asarray(t.tw2[:L])
        q = jnp.asarray(t.q[:L, 0])
        qi = jnp.asarray(t.q_neg_inv[:L, 0])

        def local(xv, tw1v, tw2v, qv, qiv):
            # xv: [L, R, C/D] — this device's column shard
            xv = self._phase1_fwd(xv, tw1v, qv, qiv)
            # distributed transpose: [L, R, C/D] -> [L, R/D, C]
            # (device d keeps global row block d; peer order restores the
            # global column order)
            yv = jax.lax.all_to_all(
                xv, self.axis, split_axis=1, concat_axis=2, tiled=True
            )
            # slice phase-2 twiddles to this device's global row block
            i = jax.lax.axis_index(self.axis)
            tw2_loc = jax.lax.dynamic_slice_in_dim(
                tw2v, i * (R // D), R // D, axis=3
            )
            yv = self._phase2_fwd(yv, tw2_loc, qv, qiv)
            # transpose back: [L, R/D, C] -> [L, R, C/D]
            return jax.lax.all_to_all(
                yv, self.axis, split_axis=2, concat_axis=1, tiled=True
            )

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self._specs(), P(), P(), P(), P()),
            out_specs=self._specs(),
        )
        out = fn(x.reshape(L, R, C), tw1, tw2, q, qi)
        return out.reshape(L, R * C)

    def intt(self, x: jnp.ndarray) -> jnp.ndarray:
        """Inverse: bit-reversed evaluation order -> natural coefficients."""
        t = self.t
        L = x.shape[0]
        D, R, C = self.D, self.R, self.C
        twi1 = jnp.asarray(t.twi1[:L])
        twi2 = jnp.asarray(t.twi2[:L])
        ninv = jnp.asarray(t.ninv[:L, 0])
        q = jnp.asarray(t.q[:L, 0])
        qi = jnp.asarray(t.q_neg_inv[:L, 0])

        def local(xv, twi1v, twi2v, ninvv, qv, qiv):
            # transpose out: [L, R, C/D] -> [L, R/D, C]
            yv = jax.lax.all_to_all(
                xv, self.axis, split_axis=1, concat_axis=2, tiled=True
            )
            i = jax.lax.axis_index(self.axis)
            twi2_loc = jax.lax.dynamic_slice_in_dim(
                twi2v, i * (R // D), R // D, axis=3
            )
            yv = self._phase2_inv(yv, twi2_loc, qv, qiv)
            xv = jax.lax.all_to_all(
                yv, self.axis, split_axis=2, concat_axis=1, tiled=True
            )
            return self._phase1_inv(xv, twi1v, ninvv, qv, qiv, True)

        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self._specs(), P(), P(), P(), P(), P()),
            out_specs=self._specs(),
        )
        out = fn(x.reshape(L, R, C), twi1, twi2, ninv, q, qi)
        return out.reshape(L, R * C)
