"""aes_fhe_tpu — a TPU-native RNS-CKKS homomorphic-evaluation framework.

Re-implements, from scratch and TPU-first, the full capability of the reference
project ``songhayeong/aes-implementation-fhe`` (AES-128 encrypt/decrypt evaluated
homomorphically over packed CKKS ciphertexts, per IACR ePrint 2024/274) — *plus*
the native CKKS engine the reference delegated to the closed-source
``desilofhe`` C++/CUDA library (reference: engine_context.py:1).

Layering (bottom-up):

- ``core``     — exact u32 RNS modular arithmetic, negacyclic NTT, base
                 conversion. Pure vectorized JAX, shaped for the TPU VPU/MXU.
- ``ckks``     — the engine: params, keys, encoder (canonical embedding),
                 encrypt/decrypt, add/mult/rescale, hybrid key-switching,
                 rotations/conjugation, power bases, bootstrap.
- ``aes``      — the AES-over-FHE layer: zeta codecs, state packing, LUT
                 algebra (XOR4, S-Box, GF multipliers), round pipeline with a
                 static noise policy (no exception-driven ladders).
- ``parallel`` — device-mesh sharding (ciphertext-batch DP axis, RNS-limb TP
                 axis) via jax.sharding.
"""

__version__ = "0.1.0"
