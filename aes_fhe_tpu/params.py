"""CKKS parameter sets: NTT-friendly prime chains and context parameters.

The reference's engine context (reference: engine_context.py:8-42) exposed only
an opaque ``signature`` knob over the closed-source desilofhe engine
(N=2^16, 2^15 slots, Q ~ 2^1658, scale ~ 2^59, depth ~17 — reference:
main.py:110-121).  Here the modulus chain is explicit and TPU-shaped:

- All primes are < 2^31 and ≡ 1 (mod 2N) so that (a) negacyclic NTTs exist and
  (b) every modular product fits the u32 Montgomery pipeline built from 16-bit
  partial products (TPUs have no 64-bit integer multiplier — this is the #1
  design constraint, see core/modular.py).
- The default scale is Δ = 2^58 realised by *pairs* of ~29-bit primes (a
  "double-prime rescale"), matching the reference's Δ ≈ 2^59 precision, which a
  single sub-31-bit prime could not reach.
- Key-switching uses a hybrid gadget with ``dnum`` digit groups and a matching
  set of ~31-bit special primes (Han–Ki style).
"""

from __future__ import annotations

import functools
import math
from dataclasses import dataclass, field

__all__ = [
    "is_prime",
    "find_ntt_primes",
    "CkksParams",
    "make_params",
    "TEST_PARAMS",
    "BENCH_PARAMS",
]


def is_prime(n: int) -> bool:
    """Deterministic Miller–Rabin for n < 3.3e24 (covers all our u32 primes)."""
    if n < 2:
        return False
    for p in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        if n % p == 0:
            return n == p
    d, s = n - 1, 0
    while d % 2 == 0:
        d //= 2
        s += 1
    for a in (2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37):
        x = pow(a, d, n)
        if x in (1, n - 1):
            continue
        for _ in range(s - 1):
            x = x * x % n
            if x == n - 1:
                break
        else:
            return False
    return True


def find_ntt_primes(
    count: int,
    bits: float,
    two_n: int,
    exclude: frozenset[int] = frozenset(),
    balance: bool = True,
) -> list[int]:
    """Find ``count`` primes p ≡ 1 (mod two_n) with p ≈ 2^bits, all < 2^31.

    When ``balance`` is set, primes are picked alternately above/below the
    target so that products of consecutive primes stay close to 2^(2*bits)
    (keeps the tracked CKKS scale from drifting across rescales).
    """
    target = int(round(2.0**bits))
    # Smallest candidate of the right congruence class at/above target.
    base = target - (target - 1) % two_n
    up = base if base >= target else base + two_n
    down = up - two_n
    found: list[int] = []
    taken = set(exclude)
    go_up = True
    while len(found) < count:
        if balance:
            if go_up:
                cand, up = up, up + two_n
            else:
                cand, down = down, down - two_n
            go_up = not go_up
        else:
            cand, up = up, up + two_n
        if cand < 3 or cand >= (1 << 31):
            if down < 3 and up >= (1 << 31):
                raise ValueError("prime search space exhausted")
            continue
        if cand not in taken and is_prime(cand):
            found.append(cand)
            taken.add(cand)
    return found


@dataclass(frozen=True)
class CkksParams:
    """Static CKKS context parameters (hashable; safe as jit static arg).

    Attributes:
      logn:     log2 of the ring degree N.
      moduli:   the ciphertext modulus chain q_0 .. q_{L-1}, ordered base
                first; rescaling always drops from the *end*.
      special:  the hybrid key-switching special primes p_0 .. p_{k-1}.
      scale:    default encoding scale Δ (integer, typically 2^58).
      dnum:     number of digit groups in the hybrid key-switch gadget.
      n_base:   number of never-dropped base primes at the front of `moduli`.
    """

    logn: int
    moduli: tuple[int, ...]
    special: tuple[int, ...]
    scale: int
    dnum: int
    n_base: int = 3

    @property
    def n(self) -> int:
        return 1 << self.logn

    @property
    def two_n(self) -> int:
        return 2 << self.logn

    @property
    def n_slots(self) -> int:
        return 1 << (self.logn - 1)

    @property
    def n_limbs(self) -> int:
        return len(self.moduli)

    @property
    def n_special(self) -> int:
        return len(self.special)

    @property
    def all_primes(self) -> tuple[int, ...]:
        """Full basis: modulus chain followed by the special primes."""
        return self.moduli + self.special

    @property
    def max_drop(self) -> int:
        """How many primes may ever be dropped (keep the base intact)."""
        return self.n_limbs - self.n_base

    @property
    def rescale_drop(self) -> int:
        """Level primes one rescale-after-multiply drops to return a squared
        scale to ~Δ: 2 for the Δ=2^58 double-prime-rescale chains, 1 for the
        Δ=2^29 single-prime chains (the depth-diet configuration — every
        multiply then burns half the limbs, so each AES round runs ~2x
        shallower and every key switch proportionally cheaper).

        Derived from the *geometric mean* of the level primes (robust to a
        hand-built chain with mixed-size level primes); ``validate()``
        asserts the resulting drop actually re-targets Δ to within 2^2 —
        mis-matched drops amplify exponentially through power bases."""
        levels = self.moduli[self.n_base :] or self.moduli
        mean_bits = sum(math.log2(q) for q in levels) / len(levels)
        return max(1, round(math.log2(self.scale) / mean_bits))

    @functools.cached_property
    def q_products(self) -> tuple[int, ...]:
        """q_products[l] = product of moduli[:l]  (Q at limb-count l)."""
        out = [1]
        for q in self.moduli:
            out.append(out[-1] * q)
        return tuple(out)

    @functools.cached_property
    def p_product(self) -> int:
        return math.prod(self.special)

    @functools.cached_property
    def groups(self) -> tuple[tuple[int, ...], ...]:
        """Hybrid-KS digit groups: a fixed partition of limb indices.

        Group j owns limb indices [j*g, min((j+1)*g, L)) with
        g = ceil(L / dnum).  At lower levels, fewer groups participate.
        """
        L = self.n_limbs
        g = -(-L // self.dnum)
        return tuple(
            tuple(range(j * g, min((j + 1) * g, L)))
            for j in range(self.dnum)
            if j * g < L
        )

    def log_q(self) -> float:
        return math.log2(self.q_products[self.n_limbs])

    def log_qp(self) -> float:
        return self.log_q() + math.log2(self.p_product)

    def validate(self) -> None:
        tn = self.two_n
        for p in self.all_primes:
            assert is_prime(p), f"{p} not prime"
            assert p % tn == 1, f"{p} != 1 mod {tn}"
            assert p < (1 << 31), f"{p} >= 2^31 (breaks u32 Montgomery)"
        assert len(set(self.all_primes)) == len(self.all_primes), "dup primes"
        # One rescale must re-target the scale: the product of the top
        # `rescale_drop` level primes has to sit within 2^2 of Δ, else the
        # post-multiply scale deficit compounds through every power basis
        # (ADVICE r1: scale_bits=44 over 29-bit primes would silently give
        # drop=2 and a ~2^14 deficit).
        if self.n_limbs > self.n_base:
            d = self.rescale_drop
            drop_bits = sum(
                math.log2(q) for q in self.moduli[self.n_limbs - d :]
            )
            assert abs(drop_bits - math.log2(self.scale)) <= 2.0, (
                f"rescale_drop={d} drops 2^{drop_bits:.1f} but scale is "
                f"2^{math.log2(self.scale):.1f}; use scale_bits matching "
                f"an integer multiple of the level-prime size"
            )
        # Special-prime product must dominate every digit-group product.
        for grp in self.groups:
            bj = math.prod(self.moduli[i] for i in grp)
            assert self.p_product >= bj, (
                f"P (2^{math.log2(self.p_product):.1f}) < digit group product "
                f"(2^{math.log2(bj):.1f}); add special primes"
            )


def make_params(
    logn: int,
    n_level_primes: int,
    dnum: int = 3,
    scale_bits: int = 58,
    base_bits: float = 30.0,
    level_bits: float = 29.0,
    n_base: int = 3,
) -> CkksParams:
    """Build a parameter set with a fresh prime chain.

    ``n_level_primes`` ~29-bit droppable primes follow ``n_base`` ~30-bit base
    primes.  Special primes are ~31-bit, enough to cover the largest digit
    group.
    """
    two_n = 2 << logn
    base = find_ntt_primes(n_base, base_bits, two_n)
    levels = find_ntt_primes(
        n_level_primes, level_bits, two_n, exclude=frozenset(base)
    )
    moduli = tuple(base + levels)
    # Digit group size determines how many 31-bit specials we need.
    g = -(-len(moduli) // dnum)
    max_group_bits = g * base_bits  # conservative upper bound
    n_special = max(1, math.ceil(max_group_bits / 30.9))
    special = tuple(
        find_ntt_primes(n_special, 30.98, two_n, exclude=frozenset(moduli))
    )
    params = CkksParams(
        logn=logn,
        moduli=moduli,
        special=special,
        scale=1 << scale_bits,
        dnum=dnum,
        n_base=n_base,
    )
    params.validate()
    return params


# Small, insecure parameters for fast CPU tests (N=256: a full 16-byte AES
# state still packs at stride n_slots/16 = 8, batching 8 blocks).
TEST_PARAMS = dict(logn=8, n_level_primes=14, dnum=3)

# Single-chip benchmark parameters (N=2^15; reference used N=2^16,
# main.py:110-112).  Depth ~12 levels without bootstrap.
BENCH_PARAMS = dict(logn=15, n_level_primes=24, dnum=3)


@functools.lru_cache(maxsize=None)
def get_params(logn: int, n_level_primes: int, dnum: int = 3, **kw) -> CkksParams:
    return make_params(logn, n_level_primes, dnum=dnum, **kw)
