"""The TPU-native CKKS engine: params, keys, encoding, and homomorphic ops.

This package is the from-scratch replacement for the closed-source
``desilofhe.Engine`` the reference depended on (reference:
engine_context.py:17-204).  The public surface is ``CkksContext`` in
``context.py``, which exposes every verb the reference's ``EngineContext``
wrapper used — encode/encrypt/decrypt, add/multiply (ct x ct / ct x pt /
scalar), rotate/conjugate/relinearize, power bases, rescale — plus explicit
level/scale discipline in place of the reference's try/except ladders
(SURVEY.md section 5, "failure detection").
"""

from .types import Ciphertext, Plaintext
from .context import CkksContext

__all__ = ["Ciphertext", "Plaintext", "CkksContext"]
