"""Checkpoint / resume: serialize keys, ciphertexts, and stage snapshots.

The reference had no persistence at all (SURVEY.md section 5 — its closest
analogs were in-memory caches: the encrypted round-key cache,
pipeline.py:75-81, and the per-stage debug dict, pipeline.py:84-98).  Here
keys and ciphertexts are plain RNS integer arrays plus exact static metadata,
so checkpointing is one compressed npz per object:

- ``save_ciphertext`` / ``load_ciphertext`` — u32 data + exact Fraction scale
  (stored as decimal strings: scales can exceed float range) + domain flag.
- ``save_keyset`` / ``load_keyset``         — the full KeySet including every
  Galois key, restorable into a context built with the same parameters.
- ``save_snapshots`` / ``load_snapshots``   — a pipeline debug dict of decoded
  per-stage states (the ``_log_pair`` equivalent), for resumable differential
  debugging across processes.

Everything round-trips bit-exactly (tests/test_serialization.py)."""

from __future__ import annotations

import json
import os
from fractions import Fraction
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from ..ckks.types import Ciphertext
from ..ckks.keys import KeySet

__all__ = [
    "save_ciphertext",
    "load_ciphertext",
    "save_keyset",
    "load_keyset",
    "save_snapshots",
    "load_snapshots",
]


def _scale_str(scale: Fraction) -> str:
    return f"{scale.numerator}/{scale.denominator}"


def _scale_of(s: str) -> Fraction:
    num, den = s.split("/")
    return Fraction(int(num), int(den))


def save_ciphertext(path: str | Path, ct: Ciphertext) -> None:
    """Atomic: write to a temp name then os.replace, so a concurrent
    poller (tools/run_dec10.sh waits on these files) can never load a
    truncated archive — same discipline as the keyset saver."""
    p = Path(path)
    if p.suffix != ".npz":  # np.savez appends .npz to suffix-less paths
        p = p.with_name(p.name + ".npz")
    tmp = p.with_name(p.name + ".tmp.npz")
    np.savez_compressed(
        tmp,
        data=np.asarray(ct.data),
        meta=json.dumps({"scale": _scale_str(ct.scale), "ntt": ct.ntt}),
    )
    os.replace(tmp, p)


def load_ciphertext(path: str | Path) -> Ciphertext:
    with np.load(Path(path), allow_pickle=False) as z:
        meta = json.loads(str(z["meta"]))
        return Ciphertext(
            data=jnp.asarray(z["data"]),
            scale=_scale_of(meta["scale"]),
            ntt=bool(meta["ntt"]),
        )


def save_keyset(path: str | Path, keys: KeySet, compress: bool = True) -> None:
    """Switching keys serialize seed-compressed: b-part + threefry key (the
    uniform a-parts regenerate on device — half the bytes on disk too).

    ``compress=False`` skips deflate: key material is uniform-looking, so
    compression wins nothing and costs tens of seconds at bench sizes — the
    bench's warm-start key cache uses the raw variant."""
    arrays = {
        "secret_mont": np.asarray(keys.secret_mont),
        "secret_ntt": np.asarray(keys.secret_ntt),
        "pk": np.asarray(keys.pk),
        "relin_b": np.asarray(keys.relin.b_mont),
        "relin_seed": np.asarray(keys.relin.jkey),
    }
    # Snapshot the dict first: the bench's ASYNC saver thread iterates it
    # while the bootstrapper may be adding its ~80 DFT Galois keys on the
    # main thread ("dictionary changed size during iteration", observed on
    # a cold enc10 run).  Individual SwitchingKeys are immutable, so a
    # shallow copy is a consistent view.
    snapshot = list(keys.galois.items())
    for g, k in snapshot:
        arrays[f"galois_{int(g)}_b"] = np.asarray(k.b_mont)
        arrays[f"galois_{int(g)}_seed"] = np.asarray(k.jkey)
    # Manifest of the Galois ids in THIS snapshot (round-3 advisor): lets
    # load_keyset detect a truncated/corrupt archive at load time instead
    # of an opaque missing-key failure deep inside a later rotate.  A set
    # snapshotted mid-bootstrap-keygen is *consistent but smaller*; that is
    # fine — Bootstrapper/ops regenerate any keys they need via
    # add_galois_keys, which fills only the gaps.
    arrays["galois_manifest"] = np.asarray(
        json.dumps(sorted(int(g) for g, _ in snapshot))
    )
    (np.savez_compressed if compress else np.savez)(Path(path), **arrays)


def load_keyset(path: str | Path) -> KeySet:
    from ..ckks.keys import SwitchingKey

    with np.load(Path(path), allow_pickle=False) as z:
        galois = {
            int(name.removeprefix("galois_").removesuffix("_b")): SwitchingKey(
                b_mont=jnp.asarray(z[name]),
                jkey=jnp.asarray(z[name.removesuffix("_b") + "_seed"]),
            )
            for name in z.files
            if name.startswith("galois_")
            and name.endswith("_b")
            and name != "galois_manifest"
        }
        if "galois_manifest" in z.files:
            expected = set(json.loads(str(z["galois_manifest"])))
            if expected != set(galois):
                raise ValueError(
                    f"keyset archive {path} is incomplete: manifest lists "
                    f"{len(expected)} Galois keys, found {len(galois)} "
                    f"(missing {sorted(expected - set(galois))[:8]}...). "
                    "Delete the cache file and regenerate."
                )
        return KeySet(
            secret_mont=jnp.asarray(z["secret_mont"]),
            secret_ntt=jnp.asarray(z["secret_ntt"]),
            pk=jnp.asarray(z["pk"]),
            relin=SwitchingKey(
                b_mont=jnp.asarray(z["relin_b"]),
                jkey=jnp.asarray(z["relin_seed"]),
            ),
            galois=galois,
        )


def save_snapshots(path: str | Path, snapshots: dict[str, np.ndarray]) -> None:
    """Persist a pipeline debug dict {stage_tag: decoded state array}."""
    np.savez_compressed(
        Path(path), **{tag: np.asarray(v) for tag, v in snapshots.items()}
    )


def load_snapshots(path: str | Path) -> dict[str, np.ndarray]:
    with np.load(Path(path), allow_pickle=False) as z:
        return {tag: z[tag] for tag in z.files}
