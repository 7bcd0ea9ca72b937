"""Sequence-parallel CKKS: the polynomial-coefficient axis sharded over a mesh.

This is the FHE analog of sequence/context parallelism (SURVEY.md §2.4): at
multi-host scale a single ciphertext's N coefficients span devices, the way a
transformer's sequence axis does under ring attention.  The reference has no
distributed code at all (it is a single-process wrapper over desilofhe,
engine_context.py:14-15); this module is the TPU-native design for that
regime, built on three structural facts of the negacyclic NTT layout:

1. **Contiguous shards make the first/last log2(D) butterfly stages
   hypercube exchanges.**  Stage s of the forward transform pairs elements
   at distance N/2^{s+1}; with the coefficient axis sharded contiguously
   across D devices, stages s < log2(D) pair WHOLE shards whose device
   indices differ in one bit — a single `jax.lax.ppermute` per stage, with a
   per-device *scalar* twiddle (each shard lies inside one twiddle block).
   The remaining log2(N/D) stages are device-local.  The inverse transform
   mirrors this (local stages first, then the hypercube).

2. **Every Galois automorphism is block-bijective on contiguous shards.**
   For any rotation/conjugation element g, the eval-domain permutation
   sigma_g maps each contiguous block of N/D positions onto exactly one
   other block (verified for all AES rotation amounts, conjugation, and
   random deltas at D = 2..16).  A cross-shard rotation is therefore ONE
   shard-to-shard `ppermute` plus a precomputed local gather — no all-to-all,
   no all-gather.  (The reference's engine rotates via CUDA kernels on one
   GPU; SURVEY §2.4 asks for exactly this ppermute lowering.)

3. **Everything else in the key switch is coefficient-pointwise.**  Gadget
   decomposition, fast base conversion, the key inner product and mod-down
   act per-coefficient across limbs, so under coefficient sharding they are
   embarrassingly parallel.  ``SpCkks.keyswitch`` therefore reuses
   ``CkksContext._keyswitch_impl`` VERBATIM (bit-exact by construction) by
   rerouting only the NTT dispatch through the collective transforms above
   (CkksContext._ntt_override).

Layout contract: global arrays keep the engine's standard shapes
([..., l, N], natural or bit-reversed order); the LAST axis is sharded
contiguously over the named mesh axis (PartitionSpec (..., "sp")).  All
results are bit-identical to the single-device engine — locked by
tests/test_sp.py on the 8-device virtual CPU mesh.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..core.modular import add_mod, sub_mod, mont_mul
from ..ckks.context import CkksContext
from ..ckks.keys import SwitchingKey
from ..ckks.types import Ciphertext

__all__ = ["SpCkks"]


class SpCkks:
    """Coefficient-sharded (sequence-parallel) views of the engine verbs.

    ``ctx`` supplies parameters, twiddle tables and keys; ``mesh`` must
    contain the named ``axis`` with a power-of-two size D dividing N.
    Switching keys must be materialized (``ctx.materialize_key_a()``):
    the seed-compressed a-part regeneration is a *global* counter-based
    sample that cannot be generated shard-locally.
    """

    def __init__(self, ctx: CkksContext, mesh: Mesh, axis: str = "sp"):
        self.ctx = ctx
        self.mesh = mesh
        self.axis = axis
        self.D = mesh.shape[axis]
        n = ctx.params.n
        assert self.D & (self.D - 1) == 0, "power-of-two shard count"
        assert n % self.D == 0 and n // self.D >= 2
        self.logd = self.D.bit_length() - 1
        self.logn = ctx.params.logn
        self._route_cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    # ------------------------------------------------------------------
    # collective negacyclic NTT (contiguous shards, hypercube exchanges)
    # ------------------------------------------------------------------
    def _hyper_pairs(self, bit: int) -> list[tuple[int, int]]:
        return [(i, i ^ (1 << bit)) for i in range(self.D)]

    def _fwd_local(self, x, psi, q, qi):
        """Forward stages on this device's shard.  x: [..., r, S] u32,
        psi/q/qi: full-width numpy constants for the row subset."""
        n, D, logd, logn = 1 << self.logn, self.D, self.logd, self.logn
        S = n // D
        d = lax.axis_index(self.axis)
        lead = x.shape[:-1]
        psi_j = jnp.asarray(psi)
        qb = q[:, :, None]   # [r, 1, 1] for the [..., r, m_loc, half] views
        qib = qi[:, :, None]
        # cross-shard stages: whole-shard hypercube exchange, scalar twiddle
        for s in range(logd):
            bit = logd - s - 1
            pv = lax.ppermute(x, self.axis, perm=self._hyper_pairs(bit))
            blk = d >> (logd - s)  # shared m-block of both partners
            tw = lax.dynamic_index_in_dim(
                psi_j, (1 << s) + blk, axis=-1, keepdims=True
            )  # [r, 1]
            is_v = ((d >> bit) & 1) == 1
            u = jnp.where(is_v, pv, x)
            v = jnp.where(is_v, x, pv)
            vs = mont_mul(v, tw, q, qi)
            x = jnp.where(is_v, sub_mod(u, vs, q), add_mod(u, vs, q))
        # local stages: identical butterflies to core.ntt with the twiddle
        # window sliced to this device's global block range
        for s in range(logd, logn):
            m = 1 << s
            half = n >> (s + 1)
            m_loc = m // D
            xs = x.reshape(*lead, m_loc, 2, half)
            u, v = xs[..., 0, :], xs[..., 1, :]
            # psi_j rows are [r, N]: slice -> [r, m_loc, 1] broadcast/half
            tw = lax.dynamic_slice_in_dim(
                psi_j, m + d * m_loc, m_loc, axis=-1
            )[:, :, None]
            vs = mont_mul(v, tw, qb, qib)
            x = jnp.stack(
                [add_mod(u, vs, qb), sub_mod(u, vs, qb)], axis=-2
            ).reshape(*lead, S)
        return x

    def _inv_local(self, x, psi_inv, ninv, q, qi):
        """Inverse stages (bit-reversed -> natural) on this device's shard."""
        n, D, logd, logn = 1 << self.logn, self.D, self.logd, self.logn
        S = n // D
        d = lax.axis_index(self.axis)
        lead = x.shape[:-1]
        psii_j = jnp.asarray(psi_inv)
        qb = q[:, :, None]
        qib = qi[:, :, None]
        for s in range(logn - logd):
            half = 1 << s
            h = n >> (s + 1)
            h_loc = h // D
            xs = x.reshape(*lead, h_loc, 2, half)
            u, v = xs[..., 0, :], xs[..., 1, :]
            tw = lax.dynamic_slice_in_dim(
                psii_j, h + d * h_loc, h_loc, axis=-1
            )[:, :, None]
            x = jnp.stack(
                [add_mod(u, v, qb), mont_mul(sub_mod(u, v, qb), tw, qb, qib)],
                axis=-2,
            ).reshape(*lead, S)
        for t in range(logd):
            pv = lax.ppermute(x, self.axis, perm=self._hyper_pairs(t))
            h = D >> (t + 1)  # n >> (s+1) in shard units
            blk = d >> (t + 1)
            tw = lax.dynamic_index_in_dim(
                psii_j, h + blk, axis=-1, keepdims=True
            )
            is_v = ((d >> t) & 1) == 1
            u = jnp.where(is_v, pv, x)
            v = jnp.where(is_v, x, pv)
            out_u = add_mod(u, v, q)
            out_v = mont_mul(sub_mod(u, v, q), tw, q, qi)
            x = jnp.where(is_v, out_v, out_u)
        return mont_mul(x, ninv, q, qi)

    # row-subset constants ------------------------------------------------
    def _row_consts(self, rows: tuple[int, ...]):
        t = self.ctx._tables_np_full
        idx = np.asarray(rows, np.int64)
        return (
            t.psi[idx],
            t.psi_inv[idx],
            t.ninv[idx][:, None],
            t.q[idx][:, None],
            t.q_neg_inv[idx][:, None],
        )

    def _ntt_rows_local(self, x, rows):
        psi, _, _, q, qi = self._row_consts(tuple(rows))
        return self._fwd_local(x, psi, q, qi)

    def _intt_rows_local(self, x, rows):
        _, psii, ninv, q, qi = self._row_consts(tuple(rows))
        return self._inv_local(x, psii, ninv, q, qi)

    # whole-array entry points (sharded in, sharded out) ------------------
    def _spec(self, ndim: int) -> P:
        return P(*([None] * (ndim - 1) + [self.axis]))

    def ntt(self, x: jnp.ndarray, rows: tuple[int, ...]) -> jnp.ndarray:
        fn = shard_map(
            functools.partial(self._ntt_rows_local, rows=tuple(rows)),
            mesh=self.mesh,
            in_specs=(self._spec(x.ndim),),
            out_specs=self._spec(x.ndim),
        )
        return fn(x)

    def intt(self, x: jnp.ndarray, rows: tuple[int, ...]) -> jnp.ndarray:
        fn = shard_map(
            functools.partial(self._intt_rows_local, rows=tuple(rows)),
            mesh=self.mesh,
            in_specs=(self._spec(x.ndim),),
            out_specs=self._spec(x.ndim),
        )
        return fn(x)

    # ------------------------------------------------------------------
    # cross-shard Galois automorphism: ppermute + local gather
    # ------------------------------------------------------------------
    def _route(self, g: int) -> tuple[np.ndarray, np.ndarray]:
        """(src_block [D], local_idx [D, S]): destination block b reads
        pv[local_idx[b]] from source block src_block[b] — valid because
        sigma_g maps contiguous blocks onto blocks (see module docstring)."""
        if g not in self._route_cache:
            perm = np.asarray(self.ctx._galois_perm(g))
            S = perm.shape[0] // self.D
            pr = perm.reshape(self.D, S)
            src = pr // S
            assert (src == src[:, :1]).all(), "not block-bijective"
            src_block = src[:, 0].copy()
            assert len(set(src_block.tolist())) == self.D
            self._route_cache[g] = (src_block, (pr % S).astype(np.int32))
        return self._route_cache[g]

    def _galois_local(self, x, g: int):
        src_block, local_idx = self._route(g)
        d = lax.axis_index(self.axis)
        pairs = [(int(src_block[dd]), dd) for dd in range(self.D)]
        pv = lax.ppermute(x, self.axis, perm=pairs)
        idx = lax.dynamic_index_in_dim(
            jnp.asarray(local_idx), d, axis=0, keepdims=False
        )
        return jnp.take(pv, idx, axis=-1)

    # ------------------------------------------------------------------
    # compound verbs: keyswitch / relinearize / rotate / conjugate
    # ------------------------------------------------------------------
    def _with_local_ntt(self, fn, *args, **kwargs):
        """Run a CkksContext compound kernel with NTT dispatch rerouted to
        the shard-local collective stages.  Must execute inside shard_map.

        The reroute installs process-global state on the shared ctx, so the
        ctx MUST NOT be used from elsewhere while this runs (another SpCkks
        on a different mesh, or a single-device call issued from inside the
        wrapped kernel would silently pick up the shard-local transforms —
        round-2 advisor finding).  Nesting is detected and rejected here;
        single-threaded tracing makes other interleavings impossible in
        practice."""
        ctx = self.ctx
        assert ctx._ntt_override is None, (
            "SpCkks reroute already active on this ctx: concurrent/nested "
            "sp use of one CkksContext is not supported"
        )
        old = (ctx._ntt_override, ctx._traced_mode)
        ctx._ntt_override = (self._ntt_rows_local, self._intt_rows_local)
        ctx._traced_mode = True
        try:
            return fn(*args, **kwargs)
        finally:
            ctx._ntt_override, ctx._traced_mode = old

    def _ksk_mat(self, ksk: SwitchingKey) -> SwitchingKey:
        assert ksk.a_mont is not None, (
            "sp keyswitch needs materialized keys: call ctx.materialize_key_a()"
        )
        return ksk

    def keyswitch(self, a: jnp.ndarray, ksk: SwitchingKey, l: int):
        """Hybrid key switch of one poly [..., l, N] under coefficient
        sharding — CkksContext._keyswitch_impl verbatim, transforms
        collective, everything else shard-local."""
        ksk = self._ksk_mat(ksk)

        def local(av, kb, ka):
            k = SwitchingKey(b_mont=kb, jkey=ksk.jkey, a_mont=ka)
            d0, d1 = self._with_local_ntt(
                self.ctx._keyswitch_impl, av, k, l=l
            )
            return d0, d1

        nd = a.ndim
        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self._spec(nd), self._spec(3), self._spec(3)),
            out_specs=(self._spec(nd), self._spec(nd)),
        )
        return fn(a, ksk.b_mont, ksk.a_mont)

    def relinearize(self, ct: Ciphertext) -> Ciphertext:
        assert ct.n_poly == 3
        l = ct.n_limbs
        ks0, ks1 = self.keyswitch(
            ct.data[..., 2, :, :], self.ctx.keys.relin, l
        )
        q, _, _ = self.ctx._ql(l)
        d0 = add_mod(ct.data[..., 0, :, :], ks0, q)
        d1 = add_mod(ct.data[..., 1, :, :], ks1, q)
        return ct.with_data(jnp.stack([d0, d1], axis=-3))

    def apply_galois(self, ct: Ciphertext, g: int) -> Ciphertext:
        g = int(g) % self.ctx.params.two_n
        if g == 1:
            return ct
        assert ct.n_poly == 2
        ksk = self._ksk_mat(self.ctx.keys.galois[g])
        l = ct.n_limbs

        def local(data, kb, ka):
            pd = self._galois_local(data, g)  # both polys in one pass
            pb, pa = pd[..., 0, :, :], pd[..., 1, :, :]
            k = SwitchingKey(b_mont=kb, jkey=ksk.jkey, a_mont=ka)
            ks0, ks1 = self._with_local_ntt(
                self.ctx._keyswitch_impl, pa, k, l=l
            )
            q, _, _ = self.ctx._ql(l)
            return jnp.stack([add_mod(pb, ks0, q), ks1], axis=-3)

        nd = ct.data.ndim
        fn = shard_map(
            local,
            mesh=self.mesh,
            in_specs=(self._spec(nd), self._spec(3), self._spec(3)),
            out_specs=self._spec(nd),
        )
        return ct.with_data(fn(ct.data, ksk.b_mont, ksk.a_mont))

    def rotate(self, ct: Ciphertext, delta: int) -> Ciphertext:
        return self.apply_galois(
            ct, self.ctx.galois_element_for_rotation(delta)
        )

    def conjugate(self, ct: Ciphertext) -> Ciphertext:
        return self.apply_galois(ct, self.ctx.params.two_n - 1)

    def shard(self, x: jnp.ndarray) -> jnp.ndarray:
        """Place a global array with the canonical coefficient sharding."""
        return jax.device_put(
            x, NamedSharding(self.mesh, self._spec(x.ndim))
        )
