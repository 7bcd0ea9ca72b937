"""Ciphertext / Plaintext containers: jax pytrees with static metadata.

A ciphertext is a stack of ring elements in RNS + NTT (evaluation) form:
``data`` u32 [n_poly, l, N] with n_poly = 2 (or 3 transiently, before
relinearization).  The scale is tracked *exactly* as a Python Fraction in the
pytree aux data — it is static under jit, so all scale management resolves at
trace time (the TPU-native replacement for the reference's runtime
exception-driven level ladders, reference: engine_context.py:180-195).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from fractions import Fraction

import jax
import jax.numpy as jnp

__all__ = ["Ciphertext", "Plaintext"]


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Ciphertext:
    data: jnp.ndarray          # u32 [n_poly, l, N], NTT domain unless ntt=False
    scale: Fraction            # exact encoding scale (static)
    ntt: bool = True           # evaluation (NTT) domain?

    @property
    def n_poly(self) -> int:
        return self.data.shape[-3]

    @property
    def n_limbs(self) -> int:
        return self.data.shape[-2]

    @property
    def batch_shape(self) -> tuple[int, ...]:
        return self.data.shape[:-3]

    def with_data(self, data: jnp.ndarray) -> "Ciphertext":
        return replace(self, data=data)

    def tree_flatten(self):
        return (self.data,), (self.scale, self.ntt)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        scale, ntt = aux
        return cls(data=data, scale=scale, ntt=ntt)


@jax.tree_util.register_pytree_node_class
@dataclass(frozen=True)
class Plaintext:
    """An encoded plaintext: u32 [l, N], NTT domain, *Montgomery form* so a
    single REDC realizes ct x pt products."""

    data: jnp.ndarray
    scale: Fraction

    @property
    def n_limbs(self) -> int:
        return self.data.shape[-2]

    def tree_flatten(self):
        return (self.data,), (self.scale,)

    @classmethod
    def tree_unflatten(cls, aux, children):
        (data,) = children
        return cls(data=data, scale=aux[0])
