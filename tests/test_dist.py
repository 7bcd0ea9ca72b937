"""Mesh-sharded execution: the (dp x tp)-sharded AES step must produce
bit-identical ciphertexts to the unsharded computation (GSPMD inserts the
collectives; the arithmetic is exact integer math, so results are equal,
not just close)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.ckks.types import Ciphertext
from aes_fhe_tpu.aes.state import StateEncoder
from aes_fhe_tpu.aes.ops import Xor4, ShiftRows, rotation_steps_required
from aes_fhe_tpu.parallel.mesh import make_mesh


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ark_matches_single_device(rng):
    params = make_params(logn=6, n_level_primes=13, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params, seed=3, rotations=tuple(rotation_steps_required(stride))
    )
    enc = StateEncoder(ctx)
    xor4 = Xor4(ctx)
    shift = ShiftRows(ctx, stride)

    B = 8
    states = rng.integers(0, 256, (B, enc.batch, 16), dtype=np.uint8)
    keys = rng.integers(0, 256, (B, enc.batch, 16), dtype=np.uint8)
    cts = [enc.encrypt(s) for s in states]
    kts = [enc.encrypt(k) for k in keys]
    scale, is_ntt = cts[0][0].scale, cts[0][0].ntt
    a_hi = jnp.stack([c[0].data for c in cts])
    k_hi = jnp.stack([c[0].data for c in kts])

    def step(ah, kh):
        mk = lambda d: Ciphertext(data=d, scale=scale, ntt=is_ntt)
        out = xor4(mk(ah), mk(kh))
        out = shift.one(out)
        return out.data

    # single-device (batched, unsharded)
    want = np.asarray(jax.jit(step)(a_hi, k_hi))

    mesh = make_mesh(n_devices=8, tp=2)
    shard = NamedSharding(mesh, P("dp", None, "tp", None))
    args = [jax.device_put(x, shard) for x in (a_hi, k_hi)]
    got = np.asarray(jax.jit(step, in_shardings=(shard, shard))(*args))

    np.testing.assert_array_equal(got, want)