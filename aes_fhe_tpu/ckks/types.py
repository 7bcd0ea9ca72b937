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

__all__ = ["Ciphertext", "Plaintext", "stack_cts", "unstack_cts"]


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


def stack_cts(cts: list["Ciphertext"]) -> "Ciphertext":
    """Stack same-shape/scale/domain ciphertexts along a new leading batch
    axis.  Every engine verb broadcasts over leading axes, so a stacked pair
    (e.g. the hi/lo nibble ciphertexts of an AES state) moves through a whole
    LUT evaluation as ONE sequence of kernels — half the dispatches and
    double the per-kernel work, which is what the TPU wants."""
    s0, l0, n0 = cts[0].scale, cts[0].n_limbs, cts[0].ntt
    assert all(
        c.scale == s0 and c.n_limbs == l0 and c.ntt == n0 for c in cts[1:]
    ), "stack_cts needs equal scales / limb counts / domains"
    return Ciphertext(
        data=jnp.stack([c.data for c in cts]), scale=s0, ntt=n0
    )


def unstack_cts(ct: "Ciphertext") -> list["Ciphertext"]:
    """Inverse of stack_cts (splits the leading batch axis)."""
    return [
        Ciphertext(data=ct.data[i], scale=ct.scale, ntt=ct.ntt)
        for i in range(ct.data.shape[0])
    ]


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
