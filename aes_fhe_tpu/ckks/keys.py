"""Key material and key generation for the TPU-native CKKS engine.

Replaces the reference engine's ``create_{secret,public,relinearization,
conjugation,rotation,bootstrap}_key`` verbs (reference: engine_context.py:44-50).

Hybrid (Han–Ki) gadget: the modulus chain is partitioned into ``dnum``
contiguous digit groups G_j with products B_j; a switching key from s' to s is

    ksk_j = ( -a_j s + e_j + g_j s',  a_j )   over Q*P,
    g_j   =  P * (Q/B_j) * [(Q/B_j)^{-1}]_{B_j}.

Because (Q/B_j) = 0 mod every prime outside G_j, the same keys serve every
ciphertext level (digit groups simply truncate).  Keys are stored in the NTT
evaluation domain and in Montgomery form, so the key-switch inner product is a
single fused REDC-multiply-accumulate per limb — the TPU-native replacement
for desilofhe's key-switch kernels.

Sampling happens host-side with numpy (seeded, deterministic): the secret and
noise are tiny integer polynomials; uniform polynomials are sampled directly
as independent uniform residues per limb in the NTT domain (valid by CRT).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax.numpy as jnp

from ..params import CkksParams

__all__ = ["KeySet", "SwitchingKey", "sample_keys_host", "SIGMA"]

SIGMA = 3.2  # discrete Gaussian width, standard CKKS choice


class SwitchingKey(NamedTuple):
    """Seed-compressed hybrid switching key.

    Only the b-part is stored; the uniform a-part regenerates on device from
    ``jkey`` (threefry) at every key switch — half the HBM of a full
    [J, 2, L+K, N] key, which is what lets ~80 Galois keys (AES rotations +
    bootstrap DFT stages) coexist with the working set on one chip.  The
    regenerated a is bit-identical to the one used at construction (same
    PRNG key, same shape)."""

    b_mont: jnp.ndarray                 # [n_groups, L+K, N] NTT, Montgomery
    jkey: jnp.ndarray                   # threefry key for the a-parts
    # Optional HBM/compute trade (CkksContext.materialize_key_a): the
    # Montgomery-form a-parts precomputed once, skipping the per-keyswitch
    # threefry regeneration.  None = seed-compressed (the default).
    a_mont: jnp.ndarray = None          # [n_groups, L+K, N] NTT, Montgomery


@dataclass
class KeySet:
    """All device-side key material.  ``galois`` maps a Galois element g to a
    switching key for sigma_g(s) -> s; rotations and conjugation both live
    there (conjugation is g = 2N-1)."""

    secret_mont: jnp.ndarray            # [L+K, N] NTT, Montgomery form
    secret_ntt: jnp.ndarray             # [L+K, N] NTT, standard form
    pk: jnp.ndarray                     # [2, L, N] NTT, Montgomery form
    relin: SwitchingKey = None
    galois: dict[int, SwitchingKey] = field(default_factory=dict)


def _gaussian_coeffs(rng: np.random.Generator, n: int) -> np.ndarray:
    return np.rint(rng.normal(0.0, SIGMA, size=n)).astype(np.int64)


def _ternary_coeffs(rng: np.random.Generator, n: int) -> np.ndarray:
    return rng.integers(-1, 2, size=n).astype(np.int64)


def _sparse_ternary_coeffs(
    rng: np.random.Generator, n: int, h: int
) -> np.ndarray:
    """Ternary secret with Hamming weight h (standard for bootstrappable
    CKKS: EvalMod's range bound K scales with sqrt(h))."""
    s = np.zeros(n, np.int64)
    idx = rng.choice(n, size=h, replace=False)
    s[idx] = rng.choice([-1, 1], size=h)
    return s


def small_poly_residues(coeffs: np.ndarray, primes) -> np.ndarray:
    """Signed small integer coeffs [N] -> u32 residues [len(primes), N]."""
    out = np.empty((len(primes), coeffs.shape[0]), np.uint32)
    for i, q in enumerate(primes):
        out[i] = (coeffs % q).astype(np.uint32)
    return out


def gadget_residues(params: CkksParams) -> np.ndarray:
    """g_j mod c for every digit group j and every prime c of Q*P: [J, L+K] u32."""
    primes = params.all_primes
    Q = params.q_products[params.n_limbs]
    P = params.p_product
    out = np.empty((len(params.groups), len(primes)), np.uint32)
    for j, grp in enumerate(params.groups):
        Bj = 1
        for i in grp:
            Bj *= params.moduli[i]
        Bhat = Q // Bj
        t = pow(Bhat, -1, Bj)
        for t_idx, c in enumerate(primes):
            out[j, t_idx] = (P % c) * (Bhat % c) % c * (t % c) % c
    return out


def sample_keys_host(
    params: CkksParams,
    rng: np.random.Generator,
    secret_hamming: int | None = None,
) -> dict[str, np.ndarray]:
    """Host-side raw samples: only the *small* polynomials (secret, noise).
    The uniform components of every key are sampled directly on device from
    a threefry key (CkksContext._uniform_device) — shipping [J, L+K, N]
    uniform polys per switching key would dominate keygen over a slow
    host<->device link."""
    n = params.n
    return {
        "s_coeff": (
            _ternary_coeffs(rng, n)
            if secret_hamming is None
            else _sparse_ternary_coeffs(rng, n, secret_hamming)
        ),
        "pk_e_coeff": _gaussian_coeffs(rng, n),
    }
