"""Mesh configuration: ciphertext-batch DP axis x RNS-limb TP axis.

The reference is single-process (SURVEY.md section 2.4); its only parallel
axis is slot-level SIMD batching.  The TPU-native scaling story:

- **dp** (data parallel): a leading axis of *independent ciphertext pairs* —
  each device evaluates the same AES round on its shard of the batch.  No
  communication inside an op.
- **tp** (tensor parallel): the RNS-limb axis of every polynomial.  Pointwise
  limb arithmetic and per-limb NTTs are embarrassingly parallel; the hybrid
  key-switch base conversions contract across limbs, where GSPMD inserts the
  all-gather/reduce collectives over ICI.

Ciphertext data layout is u32 [batch..., n_poly, L, N]; the canonical
PartitionSpec shards batch over dp and L over tp, leaving the coefficient
axis N whole (NTT stages stay device-local).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "ct_spec", "shard_pair"]


def make_mesh(n_devices: int | None = None, tp: int = 1) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    assert n % tp == 0, (n, tp)
    dp = n // tp
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def ct_spec(batched: bool = True) -> P:
    """PartitionSpec for ciphertext data [B?, n_poly, L, N]."""
    if batched:
        return P("dp", None, "tp", None)
    return P(None, "tp", None)


def shard_pair(mesh: Mesh, data: jax.Array, batched: bool = True) -> jax.Array:
    return jax.device_put(data, NamedSharding(mesh, ct_spec(batched)))
