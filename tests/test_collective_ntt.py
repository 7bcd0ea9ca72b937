"""Mesh-sharded (coefficient-axis) NTT vs the single-device transform —
bit-exact equality on the 8-device virtual CPU mesh (the ring-attention-like
all-to-all structure from SURVEY.md section 2.4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aes_fhe_tpu.core.ntt import build_ntt_tables, ntt, intt, NttTables
from aes_fhe_tpu.core.ntt_pallas import build_pallas_tables
from aes_fhe_tpu.parallel.mesh import make_mesh
from aes_fhe_tpu.parallel.collective_ntt import CollectiveNtt

LOGN = 10
PRIMES = (2013265921, 1811939329)  # NTT-friendly, = 1 mod 2^27


@pytest.fixture(scope="module")
def setup():
    t = build_ntt_tables(PRIMES, LOGN)
    t_np = NttTables(*(np.asarray(a) for a in t))
    pt = build_pallas_tables(t_np, lanes=64)  # R = 16, C = 64
    from jax.sharding import Mesh

    devices = np.asarray(jax.devices()[:4]).reshape(4)
    mesh = Mesh(devices, ("sp",))
    return t, CollectiveNtt(pt, mesh, axis="sp")


def test_collective_ntt_matches_single_device(setup, rng):
    t, cntt = setup
    x = rng.integers(0, min(PRIMES), (len(PRIMES), 1 << LOGN)).astype(
        np.uint32
    )
    want = np.asarray(ntt(jnp.asarray(x), t))
    got = np.asarray(cntt.ntt(jnp.asarray(x)))
    np.testing.assert_array_equal(got, want)


def test_collective_intt_roundtrip(setup, rng):
    t, cntt = setup
    x = rng.integers(0, min(PRIMES), (len(PRIMES), 1 << LOGN)).astype(
        np.uint32
    )
    fwd = cntt.ntt(jnp.asarray(x))
    want_inv = np.asarray(intt(jnp.asarray(fwd), t))
    got_inv = np.asarray(cntt.intt(fwd))
    np.testing.assert_array_equal(got_inv, want_inv)
    np.testing.assert_array_equal(got_inv, x)
