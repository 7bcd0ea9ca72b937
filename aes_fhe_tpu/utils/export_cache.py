"""Disk cache of traced + lowered XLA programs via ``jax.export``.

Why this exists: the XLA *compile* cache only skips the backend compiler.
Python tracing + StableHLO lowering of the big whole-op AES programs cost
~100 s/program at N=2^15 (round-2 measurement, DESIGN.md §13) and are paid
again by every fresh process — which is exactly what kept the driver's
fixed-budget bench from reaching steady state.  ``jax.export`` serializes
the lowered module + calling convention; a later process deserializes and
calls it, skipping trace AND lower entirely, and the XLA persistent cache
then supplies the compiled executable.

Determinism note: on a cache MISS the program is exported, serialized,
re-deserialized and called through the deserialized object — the same code
path a HIT takes — so the XLA compile-cache key (a hash of the module) is
identical across cold and warm processes.

Custom pytrees (Ciphertext / Plaintext, the engine's table/key
NamedTuples) register once with jax.export's serialization registry; the
exact ``Fraction`` scales ride the auxdata as "num/den" strings.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from fractions import Fraction
from pathlib import Path

import jax
from jax import export as jexport

__all__ = ["ExportCache"]

# Power-basis scale Fractions reach 2^7000+ (x^128 in the BSGS S-box);
# their decimal repr exceeds CPython's 4300-digit int->str guard, which
# both treedef stringification (cache keying) and auxdata serialization
# hit.  Raise the guard once; the auxdata itself uses hex (exempt and 20%
# smaller anyway).
sys.set_int_max_str_digits(max(sys.get_int_max_str_digits(), 1_000_000))

_REGISTERED = False


def _register_serializations() -> None:
    """Register the package's pytree node types with jax.export (idempotent;
    must happen before any serialize/deserialize)."""
    global _REGISTERED
    if _REGISTERED:
        return
    from ..ckks.types import Ciphertext, Plaintext
    from ..core.ntt import NttTables
    from ..ckks.keys import SwitchingKey

    def _frac_s(f: Fraction) -> str:
        return f"{f.numerator:#x}/{f.denominator:#x}"

    def _frac_d(s: str) -> Fraction:
        n, d = s.split("/")
        return Fraction(int(n, 16), int(d, 16))

    jexport.register_pytree_node_serialization(
        Ciphertext,
        serialized_name="aes_fhe_tpu.Ciphertext",
        serialize_auxdata=lambda aux: json.dumps(
            [_frac_s(aux[0]), aux[1]]
        ).encode(),
        deserialize_auxdata=lambda b: (
            (lambda s, ntt: (_frac_d(s), ntt))(*json.loads(b))
        ),
    )
    jexport.register_pytree_node_serialization(
        Plaintext,
        serialized_name="aes_fhe_tpu.Plaintext",
        serialize_auxdata=lambda aux: _frac_s(aux[0]).encode(),
        deserialize_auxdata=lambda b: (_frac_d(b.decode()),),
    )
    jexport.register_namedtuple_serialization(
        NttTables, serialized_name="aes_fhe_tpu.NttTables"
    )
    jexport.register_namedtuple_serialization(
        SwitchingKey, serialized_name="aes_fhe_tpu.SwitchingKey"
    )
    _REGISTERED = True


def _sig(obj, out: list) -> None:
    """Fast structural fingerprint of an argument pytree.

    NOT str(treedef): treedef stringification decimal-prints the exact
    Fraction scales in Ciphertext aux data, and power-basis scales reach
    2^25000 — CPython's quadratic int->decimal conversion made every cache
    *lookup* cost ~100s of ms (measured: +1.8 s on the steady AES round).
    Fractions print in hex here (linear time)."""
    from ..ckks.types import Ciphertext, Plaintext

    if isinstance(obj, Ciphertext):
        out.append(
            f"Ct[{tuple(obj.data.shape)}:{obj.data.dtype}"
            f"@{obj.scale.numerator:#x}/{obj.scale.denominator:#x}"
            f",{obj.ntt}]"
        )
    elif isinstance(obj, Plaintext):
        out.append(
            f"Pt[{tuple(obj.data.shape)}:{obj.data.dtype}"
            f"@{obj.scale.numerator:#x}/{obj.scale.denominator:#x}]"
        )
    elif isinstance(obj, dict):
        out.append("{")
        for k in sorted(obj):
            out.append(repr(k))
            _sig(obj[k], out)
        out.append("}")
    elif isinstance(obj, (tuple, list)):
        out.append(type(obj).__name__ + "(")
        if hasattr(obj, "_fields"):  # NamedTuple
            out.append(obj.__class__.__qualname__)
        for v in obj:
            _sig(v, out)
        out.append(")")
    elif obj is None:
        out.append("None")
    elif hasattr(obj, "shape") and hasattr(obj, "dtype"):
        out.append(f"{tuple(obj.shape)}:{obj.dtype}")
    elif isinstance(obj, Fraction):
        out.append(f"{obj.numerator:#x}/{obj.denominator:#x}")
    else:
        out.append(f"{type(obj).__name__}:{obj!r}")


class ExportCache:
    """One directory of ``{tag}-{key}.jaxexp`` serialized programs.

    ``get_or_build(tag, extra, jitted, args, kwargs)`` returns a callable
    with the jitted function's semantics whose trace+lower came either from
    disk or from exporting now.  Failures fall back to ``None`` (caller
    uses the plain jit path) — the cache must never break the bench.
    """

    def __init__(self, directory: str | os.PathLike):
        self.dir = Path(directory)
        self._mem: dict[str, object] = {}
        # every cache file this process loaded or created, in use order —
        # the bench writes these to a manifest so a fast static test can
        # assert the committed cache still covers the driver's round
        # (round-4: a re-exported .jaxexp sat untracked and the driver
        # re-exported + recompiled its way past the budget)
        self.used: list[str] = []

    def _key(self, tag: str, extra: str, args, kwargs) -> str:
        parts = [jax.__version__, jax.default_backend(), tag, extra]
        _sig((args, kwargs), parts)
        return hashlib.sha256("\x00".join(parts).encode()).hexdigest()[:24]

    def _path(self, tag: str, key: str) -> Path:
        safe = "".join(c if c.isalnum() or c in "._-" else "_" for c in tag)
        return self.dir / f"{safe}-{key}.jaxexp"

    def get_or_build_exported(self, tag, extra, jitted, args, kwargs=None):
        """Like ``get_or_build`` but returns the raw ``jax.export.Exported``
        object (or None on failure) — callers that need ``out_avals`` for
        shape-chaining without running anything (the multichip dryrun's
        per-op program pipeline) use this and wrap ``.call`` themselves."""
        kwargs = kwargs or {}
        try:
            _register_serializations()
            key = self._key(tag, extra, args, kwargs)
        except Exception as e:
            self._warn("keying failed", tag, e)
            return None
        path = self._path(tag, key)
        blob = None
        if path.exists():
            try:
                t0 = time.time()
                blob = path.read_bytes()
                self._warn(
                    f"loaded in {time.time()-t0:.1f}s "
                    f"({len(blob)/1e6:.1f} MB)", tag, None
                )
            except OSError as e:
                self._warn("read failed", tag, e)
        if blob is None:
            try:
                t0 = time.time()
                exported = jexport.export(jitted)(*args, **kwargs)
                blob = exported.serialize()
                self.dir.mkdir(parents=True, exist_ok=True)
                tmp = path.with_suffix(f".tmp{os.getpid()}")
                tmp.write_bytes(blob)
                os.replace(tmp, path)
                self._warn(
                    f"exported in {time.time()-t0:.1f}s "
                    f"({len(blob)/1e6:.1f} MB)", tag, None
                )
            except Exception as e:
                self._warn("export failed", tag, e)
                return None
        try:
            out = jexport.deserialize(blob)
            if path.name not in self.used:
                self.used.append(path.name)
            return out
        except Exception as e:
            self._warn("deserialize failed", tag, e)
            return None

    def get_or_build(self, tag, extra, jitted, args, kwargs=None):
        """Return ``(callable, status)``; callable is None if both the disk
        load and a fresh export failed (caller should use plain jit)."""
        kwargs = kwargs or {}
        try:
            _register_serializations()
            key = self._key(tag, extra, args, kwargs)
        except Exception as e:
            self._warn("keying failed", tag, e)
            return None, "error"
        path = self._path(tag, key)
        if key in self._mem:
            if path.name not in self.used:
                self.used.append(path.name)
            return self._mem[key], "mem"
        blob = None
        status = "miss"
        if path.exists():
            try:
                blob = path.read_bytes()
                status = "hit"
            except OSError as e:
                self._warn("read failed", tag, e)
        if blob is None:
            try:
                t0 = time.time()
                exported = jexport.export(jitted)(*args, **kwargs)
                blob = exported.serialize()
                self.dir.mkdir(parents=True, exist_ok=True)
                tmp = path.with_suffix(f".tmp{os.getpid()}")
                tmp.write_bytes(blob)
                os.replace(tmp, path)
                self._warn(
                    f"exported in {time.time()-t0:.1f}s "
                    f"({len(blob)/1e6:.1f} MB)", tag, None
                )
            except Exception as e:  # export unsupported for this program
                self._warn("export failed", tag, e)
                return None, "error"
        try:
            t0 = time.time()
            exported = jexport.deserialize(blob)
            # jit the call so repeated invocations ride the pjit fast path
            call = jax.jit(exported.call)
            if status == "hit":
                self._warn(
                    f"loaded in {time.time()-t0:.1f}s "
                    f"({len(blob)/1e6:.1f} MB)", tag, None
                )
        except Exception as e:
            self._warn("deserialize failed", tag, e)
            return None, "error"
        self._mem[key] = call
        if path.name not in self.used:
            self.used.append(path.name)
        return call, status

    @staticmethod
    def _warn(msg: str, tag: str, err) -> None:
        detail = f": {type(err).__name__}: {err}" if err is not None else ""
        print(f"export-cache[{tag}]: {msg}{detail}", file=sys.stderr)
