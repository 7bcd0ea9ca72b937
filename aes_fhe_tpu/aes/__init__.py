"""AES-128 over CKKS: zeta codecs, packed state, LUT algebra, round pipeline.

Functional parity layer with the reference's L2-L5 (SURVEY.md section 1):
ZetaCodec (utils.py), StateEncoder (state_encoder.py), XOR4/S-Box/GF-mult
LUTs (xor4_lut.py, sub_bytes_lut.py, mixcol_final.py, invmixcolumns_fhe.py),
ShiftRows/InvShiftRows (shift_rows.py, inv_shiftrows.py) and the AES128
pipeline (pipeline.py) — redesigned TPU-first: lazy relinearization, BSGS
S-box, scalar-plaintext coefficient caches, static snap/bootstrap policy.
"""

from .zeta import ZetaCodec
from .state import StateEncoder
from .pipeline import AES128, SnapPolicy

__all__ = ["ZetaCodec", "StateEncoder", "AES128", "SnapPolicy"]
