"""Sequence-parallel (coefficient-sharded) engine ops — bit-exact vs the
single-device engine on the 8-device virtual CPU mesh.

Covers SURVEY.md §2.4's distributed checklist rows the reference never had:
the collective NTT wired into the key switch, and cross-shard Galois
rotation lowered to ppermute (the permutation spans devices)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.parallel.sp import SpCkks



@pytest.fixture(scope="module")
def sp_setup():
    params = make_params(logn=8, n_level_primes=7, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=3,
        rotations=(1, -1, stride, -3 * stride),
        conjugation=True,
        ntt_impl="xla",
    )
    ctx.materialize_key_a()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    return ctx, SpCkks(ctx, mesh)


@pytest.mark.fast
def test_sp_ntt_bit_exact(sp_setup, rng):
    ctx, sp = sp_setup
    p = ctx.params
    rows = (0, 2, 3, p.n_limbs, p.n_limbs + 1)  # mixed Q and special rows
    x = np.stack(
        [
            rng.integers(0, p.all_primes[r], size=(2, p.n), dtype=np.uint32)
            for r in rows
        ],
        axis=1,
    )  # valid residues per row
    ref = np.asarray(ctx._ntt(jnp.asarray(x), rows))
    got = np.asarray(sp.ntt(sp.shard(jnp.asarray(x)), rows))
    assert np.array_equal(got, ref)
    # inverse returns the input exactly (and matches the reference inverse)
    refi = np.asarray(ctx._intt(jnp.asarray(ref), rows))
    goti = np.asarray(sp.intt(sp.shard(jnp.asarray(ref)), rows))
    assert np.array_equal(goti, refi)
    assert np.array_equal(goti, x)


@pytest.mark.slow
def test_sp_keyswitch_relin_bit_exact(sp_setup, rng):
    ctx, sp = sp_setup
    vals = rng.standard_normal(ctx.params.n_slots) * 0.3
    ct = ctx.encrypt(vals)
    t = ctx.tensor(ct, ct)
    ref = ctx.relinearize(t)
    got = sp.relinearize(t.with_data(sp.shard(t.data)))
    assert np.array_equal(np.asarray(got.data), np.asarray(ref.data))
    assert got.scale == ref.scale


@pytest.mark.slow
def test_sp_keyswitch_bench_limb_count(rng):
    """Relinearize with the coefficient axis sharded 8 ways at a bench-class
    limb count (40 level primes -> l=43 Q rows, the depth-diet working level
    and the same keyswitch *shape class* — multi-digit-group, many-limb — as
    `bench.py round`'s l=71).

    Round-3 advisor finding: the original l=71/dnum=3 parameterization
    (device keygen + two full relinearize compiles at 99 rows on XLA:CPU
    with persistent caching off) pushed this single test past 25 minutes on
    the 2-core driver hosts, killing the whole sp lane.  l=43 exercises the
    identical code path (all 3 digit groups participate once l exceeds
    2*ceil(L/dnum)=30; the full-width l=71 shape is covered on the real chip
    by `bench.py ks`) in a fraction of the compile budget.  Set
    AES_FHE_SP_FULL_LIMBS=1 to run the original l=71 shape on hosts with
    compile budget to spare."""
    full = os.environ.get("AES_FHE_SP_FULL_LIMBS", "0") == "1"
    n_level = 68 if full else 40
    params = make_params(logn=8, n_level_primes=n_level, dnum=3)
    ctx = CkksContext(params, seed=3, rotations=(), conjugation=False,
                      ntt_impl="xla")
    ctx.materialize_key_a()
    mesh = Mesh(np.asarray(jax.devices()[:8]), ("sp",))
    sp = SpCkks(ctx, mesh)
    vals = rng.standard_normal(ctx.params.n_slots) * 0.3
    ct = ctx.encrypt(vals)
    t = ctx.tensor(ct, ct)
    assert t.n_limbs >= (69 if full else 41)
    ref = ctx.relinearize(t)
    got = sp.relinearize(t.with_data(sp.shard(t.data)))
    assert np.array_equal(np.asarray(got.data), np.asarray(ref.data))
    assert got.scale == ref.scale


@pytest.mark.slow
@pytest.mark.parametrize("delta", [1, -1, 16, -48])
def test_sp_rotate_bit_exact(sp_setup, rng, delta):
    ctx, sp = sp_setup
    stride = ctx.params.n_slots // 16
    delta = delta if abs(delta) < 16 else (stride if delta > 0 else -3 * stride)
    vals = rng.standard_normal(ctx.params.n_slots) * 0.3
    ct = ctx.encrypt(vals)
    ref = ctx.rotate(ct, delta)
    got = sp.rotate(ct.with_data(sp.shard(ct.data)), delta)
    assert np.array_equal(np.asarray(got.data), np.asarray(ref.data))
    # decoded slots really are rotated
    dec = ctx.decrypt_values(got)
    np.testing.assert_allclose(
        dec.real, np.roll(vals, delta), atol=1e-4
    )


@pytest.mark.slow
def test_sp_conjugate_bit_exact(sp_setup, rng):
    ctx, sp = sp_setup
    vals = (
        rng.standard_normal(ctx.params.n_slots)
        + 1j * rng.standard_normal(ctx.params.n_slots)
    ) * 0.3
    ct = ctx.encrypt(vals)
    ref = ctx.conjugate(ct)
    got = sp.conjugate(ct.with_data(sp.shard(ct.data)))
    assert np.array_equal(np.asarray(got.data), np.asarray(ref.data))
