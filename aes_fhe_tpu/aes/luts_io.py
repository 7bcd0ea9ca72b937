"""LUT coefficient JSON store, schema-compatible with the reference.

Schema (reference: lut.py:10-62, gen/coeff/*.json):
  1D: {"entries": [[k, re, im], ...]}
  2D: {"entries": [[p, q, re, im], ...]}  (+ optional metadata keys)

The offline generators in aes/luts.py are the source of truth (regenerated
from first principles, unit-normalized — fixing the reference's x256-scaled
XOR set, SURVEY.md quirk Q2); this module persists/loads them in the same
JSON shape so reference coefficient files can be diffed directly
(tests/test_luts_io.py does exactly that)."""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

__all__ = [
    "save_coeff1d",
    "save_coeff2d",
    "load_coeff1d",
    "load_coeff2d",
    "write_all_coeff_files",
]

TOL = 1e-11


def save_coeff1d(path: Path, coeffs: np.ndarray, **metadata) -> None:
    entries = [
        [int(k), float(c.real), float(c.imag)]
        for k, c in enumerate(np.asarray(coeffs))
        if abs(c) > TOL
    ]
    obj = {**metadata, "entries": entries}
    Path(path).write_text(json.dumps(obj))


def save_coeff2d(path: Path, coeffs: np.ndarray, **metadata) -> None:
    c = np.asarray(coeffs)
    entries = [
        [int(p), int(q), float(c[p, q].real), float(c[p, q].imag)]
        for p in range(c.shape[0])
        for q in range(c.shape[1])
        if abs(c[p, q]) > TOL
    ]
    obj = {**metadata, "entries": entries}
    Path(path).write_text(json.dumps(obj))


def load_coeff1d(path: Path, size: int) -> np.ndarray:
    obj = json.loads(Path(path).read_text())
    out = np.zeros(size, np.complex128)
    for k, re, im in obj["entries"]:
        out[int(k)] = complex(re, im)
    return out


def load_coeff2d(path: Path, shape: tuple[int, int]) -> np.ndarray:
    obj = json.loads(Path(path).read_text())
    out = np.zeros(shape, np.complex128)
    for p, q, re, im in obj["entries"]:
        out[int(p), int(q)] = complex(re, im)
    return out


def write_all_coeff_files(out_dir: Path) -> list[Path]:
    """Regenerate every coefficient set the reference ships
    (gen/coeff/*.json inventory, SURVEY.md C22), unit-normalized."""
    from . import luts

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    written = []

    def w2(name, arr, **md):
        p = out_dir / name
        save_coeff2d(p, arr, **md)
        written.append(p)

    def w1(name, arr, **md):
        p = out_dir / name
        save_coeff1d(p, arr, **md)
        written.append(p)

    w2("xor4_coeffs.json", luts.xor4_coeffs())
    for k in (1, 2, 3, 9, 11, 13, 14):
        hi, lo = luts.gf_mult_coeffs(k)
        w2(f"gf_mult{k}_hi_coeffs.json", hi, mult=k, which="hi")
        w2(f"gf_mult{k}_lo_coeffs.json", lo, mult=k, which="lo")
    for inv, tag in ((False, ""), (True, "inv_")):
        hi, lo = luts.sbox_coeffs(inv)
        w1(f"{tag}mod256_to_16_hi_coeffs.json", hi)
        w1(f"{tag}mod256_to_16_lo_coeffs.json", lo)
    w1("lift16_to_256_coeffs.json", luts.lift16_to_256_coeffs())
    w1("zeta16_snap_coeffs.json", luts.zeta16_snap_coeffs())
    return written
