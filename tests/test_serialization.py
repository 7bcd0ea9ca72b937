"""Checkpoint/resume round-trips: keys, ciphertexts, stage snapshots.

The reference had no persistence (SURVEY.md section 5); this is the
checkpoint/resume subsystem of the TPU build.  Everything must round-trip
bit-exactly, and a restored keyset must decrypt a restored ciphertext."""

import numpy as np
import pytest

from aes_fhe_tpu.params import make_params
from aes_fhe_tpu.ckks import CkksContext
from aes_fhe_tpu.aes.state import StateEncoder
from aes_fhe_tpu.aes.ops import Xor4, rotation_steps_required
from aes_fhe_tpu.utils.serialization import (
    save_ciphertext,
    load_ciphertext,
    save_keyset,
    load_keyset,
    save_snapshots,
    load_snapshots,
)


@pytest.fixture(scope="module")
def sctx():
    params = make_params(logn=7, n_level_primes=12, dnum=3)
    stride = params.n_slots // 16
    return CkksContext(
        params, seed=3, rotations=tuple(rotation_steps_required(stride))
    )


def test_ciphertext_roundtrip(sctx, tmp_path, rng):
    enc = StateEncoder(sctx)
    s = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    hi, lo = enc.encrypt(s)
    p = tmp_path / "ct.npz"
    save_ciphertext(p, hi)
    back = load_ciphertext(p)
    assert back.scale == hi.scale and back.ntt == hi.ntt
    np.testing.assert_array_equal(np.asarray(back.data), np.asarray(hi.data))


def test_keyset_roundtrip_decrypts(sctx, tmp_path, rng):
    enc = StateEncoder(sctx)
    s = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(s)
    kp, cp = tmp_path / "keys.npz", tmp_path / "ct.npz"
    save_keyset(kp, sctx.keys)
    save_ciphertext(cp, ct[0])
    restored = load_keyset(kp)
    assert set(restored.galois) == set(sctx.keys.galois)
    np.testing.assert_array_equal(
        np.asarray(restored.relin.b_mont), np.asarray(sctx.keys.relin.b_mont)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.relin.jkey), np.asarray(sctx.keys.relin.jkey)
    )
    # restore into the context and use the keys end-to-end
    sctx.keys = restored
    sctx._jnp_state = None
    hi = load_ciphertext(cp)
    got = enc.decrypt(hi, ct[1], n_blocks=enc.batch)
    np.testing.assert_array_equal(got, s)
    # Galois keys restored: a homomorphic op that key-switches still works
    x = Xor4(sctx)
    out = x(hi, hi)
    want = (s >> 4) ^ (s >> 4)
    got_hi = enc.decrypt(out, ct[1], n_blocks=enc.batch)[:, :]
    # decode uses hi nibble of out and lo of ct[1]; compare hi nibbles only
    np.testing.assert_array_equal(got_hi >> 4, want)


def test_keyset_manifest_detects_truncation(sctx, tmp_path):
    """An archive whose Galois entries don't match its manifest (e.g. a
    corrupt or hand-truncated cache file) is rejected at LOAD time with an
    actionable error, not at first use of the missing key deep inside a
    rotate (round-3 advisor finding)."""
    kp = tmp_path / "keys.npz"
    save_keyset(kp, sctx.keys)
    with np.load(kp, allow_pickle=False) as z:
        arrays = {name: z[name] for name in z.files}
    # drop one Galois key's arrays but keep the manifest
    victim = next(
        n for n in arrays
        if n.startswith("galois_") and n.endswith("_b")
        and n != "galois_manifest"
    )
    arrays.pop(victim)
    arrays.pop(victim.removesuffix("_b") + "_seed")
    np.savez(tmp_path / "trunc.npz", **arrays)
    with pytest.raises(ValueError, match="incomplete"):
        load_keyset(tmp_path / "trunc.npz")


def test_snapshots_roundtrip(tmp_path, rng):
    snaps = {
        "enc.r1.sub": rng.integers(0, 256, (8, 16), dtype=np.uint8),
        "enc.r1.mc": rng.integers(0, 256, (8, 16), dtype=np.uint8),
    }
    p = tmp_path / "snaps.npz"
    save_snapshots(p, snaps)
    back = load_snapshots(p)
    assert set(back) == set(snaps)
    for tag in snaps:
        np.testing.assert_array_equal(back[tag], snaps[tag])
