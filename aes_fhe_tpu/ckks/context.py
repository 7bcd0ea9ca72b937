"""CkksContext — the TPU-native CKKS engine.

Covers the full verb surface the reference pulled from desilofhe via its
``EngineContext`` wrapper (reference: engine_context.py:17-204 and SURVEY.md
section 2.2): context/keygen, encode/encrypt/decrypt, add/sub/multiply
(ct x ct, ct x plaintext, ct x scalar), relinearize, rescale, rotate,
conjugate — implemented as pure jax functions over u32 RNS arrays that compose
and fuse under a single jit (the reference crossed a Python->C++ FFI boundary
thousands of times per AES round; here a whole round is one XLA program).

Design points that differ deliberately from a CUDA/C++ port:

- NTT-resident ciphertexts; Galois automorphisms are precomputed index
  permutations of the evaluation domain (gathers), not coefficient shuffles.
- Exact static scale/level tracking (Fractions at trace time) replaces the
  reference's runtime try/except bootstrap ladders (engine_context.py:180-195).
- Slot-constant plaintexts collapse to *two u32 scalars per limb* via the
  closed form  const = a + b*X^{N/2}  (X^{N/2} evaluates to -i on every
  canonical slot).  LUT coefficient caches therefore cost O(L) memory instead
  of O(L*N), and constant multiplication is a per-limb scalar Montgomery
  multiply.
"""

from __future__ import annotations

import functools
from fractions import Fraction

import numpy as np
import jax
import jax.numpy as jnp

from ..params import CkksParams
from ..core.modular import add_mod, sub_mod, neg_mod, mont_mul, mont_constants
from ..core.ntt import (
    NttTables,
    build_ntt_tables,
    ntt,
    intt,
    ntt_host,
    _host_mont_mul,
    bit_reverse_perm,
)
from ..core.ntt_pallas import PallasNttTables, build_pallas_tables, ntt_pl, intt_pl
from ..core.rns import ConvTables, make_conv_tables, base_convert
from ..core.modular import barrett_reduce
from .encoder import Encoder
from .types import Ciphertext, Plaintext
from .keys import (
    KeySet,
    SwitchingKey,
    sample_keys_host,
    small_poly_residues,
    gadget_residues,
    _gaussian_coeffs,
    _ternary_coeffs,
)

__all__ = ["CkksContext"]

_R = 1 << 32


def _strkeys(obj):
    """Bijectively rename int dict keys to '#i<k>' strings through nested
    dict/list/tuple containers (jax.export serializes only string-keyed
    dicts).  Zero-padded so lexicographic order == numeric order: jax sorts
    dict keys when flattening, and a changed leaf order would change the
    compiled HLO (invalidating the persistent compile cache) — with the
    padding the flattened program is byte-identical to the int-keyed one.
    Registered pytree nodes (Ciphertext, NamedTuples) pass through
    untouched — their children are arrays, never dicts."""
    if isinstance(obj, dict):
        return {
            (f"#i{k:08d}" if isinstance(k, int) else k): _strkeys(v)
            for k, v in obj.items()
        }
    if isinstance(obj, tuple) and not hasattr(obj, "_fields"):
        return tuple(_strkeys(v) for v in obj)
    if isinstance(obj, list):
        return [_strkeys(v) for v in obj]
    return obj


def _intkeys(obj):
    """Inverse of _strkeys."""
    if isinstance(obj, dict):
        return {
            (int(k[2:]) if isinstance(k, str) and k.startswith("#i") else k):
            _intkeys(v)
            for k, v in obj.items()
        }
    if isinstance(obj, tuple) and not hasattr(obj, "_fields"):
        return tuple(_intkeys(v) for v in obj)
    if isinstance(obj, list):
        return [_intkeys(v) for v in obj]
    return obj


def _trace_state_clean() -> bool:
    """True when no jit trace is in progress (safe to create device arrays
    for host-side caches).  Falls back to False (= keep numpy) if the
    private API moves."""
    try:
        from jax._src import core as _jcore

        return bool(_jcore.trace_state_clean())
    except Exception:
        return False


def _u32(x) -> np.ndarray:
    return np.asarray(x, np.uint32)


class CkksContext:
    """Engine context: parameters, twiddle/conversion tables, and keys.

    All homomorphic verbs are pure functions of their pytree arguments and
    the (constant) tables, so any composition of them can be wrapped in
    jax.jit by callers.  Host-side work (encoding, CRT decode, sampling)
    stays outside the device path, mirroring the reference's split.
    """

    def __init__(
        self,
        params: CkksParams,
        seed: int = 0,
        rotations: tuple[int, ...] = (),
        conjugation: bool = True,
        secret_hamming: int | None = None,
        ntt_impl: str = "auto",
        keygen: bool = True,
        ladder_elevate: bool = True,
    ):
        """``keygen=False`` builds tables only; the caller must then call
        ``install_keys`` with a persisted KeySet (utils/serialization.py)
        before using any verb — the bench uses this to skip the ~45 s
        device keygen on warm driver runs.

        ``ladder_elevate=False`` disables the automatic Δ² elevated tier
        for power ladders on thin (Δ<2^40) chains (``ladder()``).  The
        elevation is a *precision* requirement at production ring sizes
        (DESIGN.md §15); at unit-test/dryrun sizes (logn≤8) the bare chain
        already decodes bit-exact and the elevation costs ~6 extra limbs
        per round — the multichip dryrun opts out to keep the XLA:CPU
        SPMD programs small."""
        self.params = params
        self.secret_hamming = secret_hamming
        self.ladder_elevate = ladder_elevate
        self.encoder = Encoder(params)
        p = params
        self.n_all = len(p.all_primes)
        self.L = p.n_limbs
        self.K = p.n_special

        # --- twiddle tables over the full basis Q*P ------------------------
        # Kept as numpy: row subsets are lru-cached and may first be built
        # inside a jit trace, where jnp slicing would leak tracers; numpy
        # arrays enter traced computations as constants.
        t = build_ntt_tables(p.all_primes, p.logn)
        self.tables = NttTables(*(np.asarray(x) for x in t))
        # permanent numpy copy: host-side encoding must stay trace-free even
        # while jit_fn has swapped self.tables for traced arguments
        self._tables_np_full = self.tables

        # --- NTT implementation: fused Pallas kernel on real TPUs ----------
        # "auto" picks the VMEM-resident Pallas transform when the default
        # backend is a TPU (it is the keyswitch bottleneck: the XLA path
        # round-trips every butterfly stage through HBM, and its unrolled
        # butterfly stages make per-op programs large enough to choke the
        # remote compiler); CPU tests keep the XLA path unless a test opts
        # in (the kernel runs in interpret mode off-TPU).
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        if ntt_impl == "auto":
            ntt_impl = "pallas" if backend == "tpu" and p.logn >= 9 else "xla"
        assert ntt_impl in ("xla", "pallas"), ntt_impl
        self.ntt_impl = ntt_impl
        self._pl_interpret = backend != "tpu"
        # Base-conversion matmul plane dtype follows the backend THIS
        # context targets (resolved once here), not the process-global
        # default at trace time (round-2 advisor finding).
        self._conv_plane = (
            jnp.bfloat16 if backend == "tpu" else jnp.float32
        )
        self.ptables: PallasNttTables | None = (
            build_pallas_tables(self.tables, lanes=min(128, p.n // 16))
            if ntt_impl == "pallas"
            else None
        )

        # --- per-prime Montgomery constants (numpy, sliced per level) ------
        mc = mont_constants(p.all_primes)
        self._q_np = mc["q"]
        self._qinv_np = mc["q_neg_inv"]
        self._r2_np = mc["r2"]
        self._mu_np = mc["mu"]

        # --- rescale tables: drop modulus d -> remaining i < d -------------
        L = self.L
        self._qmod = np.zeros((L, L), np.uint32)       # q_d mod q_i
        self._invq_mont = np.zeros((L, L), np.uint32)  # (q_d^-1 mod q_i)*R
        for d in range(L):
            qd = p.moduli[d]
            for i in range(d):
                qi = p.moduli[i]
                self._qmod[d, i] = qd % qi
                self._invq_mont[d, i] = pow(qd, -1, qi) * _R % qi

        # --- mod-down by P tables ------------------------------------------
        self._pinv_mont = _u32(
            [pow(p.p_product % q, -1, q) * _R % q for q in p.moduli]
        )

        # --- evaluation-point exponent map & X^{N/2} fast path -------------
        self._e_map, self._inv_e = self._compute_exponent_map()
        self._pnh_mont = self._compute_pnh_mont()      # [L+K, N] u32

        # --- Galois permutation cache --------------------------------------
        self._perm_cache: dict[int, jnp.ndarray] = {}

        # --- per-limb-count jitted compound kernels ------------------------
        self._ks_jit: dict[int, object] = {}
        self._rs_jit: dict[int, object] = {}
        # True while tracing under jit_fn: inner jits must be bypassed then
        # (calling a nested jit with outer tracers caches a jaxpr whose
        # captured constants are those tracers — a leak on the next eager
        # call).
        self._traced_mode = False
        self._jnp_state = None
        self._ntt_override = None  # (fwd, inv) — see parallel/sp.py

        # --- keys -----------------------------------------------------------
        self._rng = np.random.default_rng(seed)
        # Device-side PRNG root for the *uniform* key components: sampling
        # [J, L+K, N] uniform polys host-side and shipping them cost ~40 MB
        # per switching key over this environment's ~30 MB/s tunnel; the
        # threefry sampler generates them on-chip from a 64-bit key instead.
        self._jroot = jax.random.PRNGKey(int(self._rng.integers(1 << 62)))
        self._jkey_counter = 0
        self._g_mont_np: np.ndarray | None = None
        if keygen:
            self.keys = self._keygen()
            self.add_galois_keys(
                [self.galois_element_for_rotation(r) for r in rotations]
                + ([p.two_n - 1] if conjugation else [])
            )
        else:
            self.keys = None  # install_keys must follow

        # --- profiling counters (reference kept bootstrap stats,
        #     engine_context.py:52-54) --------------------------------------
        self.stats = {"keyswitch": 0, "bootstrap": 0}

    # ------------------------------------------------------------------
    # table plumbing
    # ------------------------------------------------------------------
    @functools.lru_cache(maxsize=None)
    def _rows_ext(self, l: int) -> tuple[int, ...]:
        """Row indices for the extended basis Q_l * P."""
        return tuple(range(l)) + tuple(range(self.L, self.n_all))

    def _tables_rows(self, rows: tuple[int, ...]) -> NttTables:
        if isinstance(self.tables.psi, np.ndarray):
            return self._tables_rows_np(rows)
        # traced state (see jit_fn): tables are tracers, gather rows in-graph
        idx = jnp.asarray(rows, jnp.int32)
        return NttTables(
            *(jnp.take(x, idx, axis=0) for x in self.tables)
        )

    @functools.lru_cache(maxsize=None)
    def _tables_rows_np(self, rows: tuple[int, ...]) -> NttTables:
        idx = np.asarray(rows, np.int64)
        t = self._tables_np_full
        return NttTables(
            psi=t.psi[idx],
            psi_inv=t.psi_inv[idx],
            ninv=t.ninv[idx],
            q=t.q[idx],
            q_neg_inv=t.q_neg_inv[idx],
        )  # numpy slices: trace-safe constants

    def _tab(self, l: int) -> NttTables:
        return self._tables_rows(tuple(range(l)))

    def _ptables_rows(self, rows: tuple[int, ...]) -> PallasNttTables:
        if isinstance(self.ptables.tw1, np.ndarray):
            return self._ptables_rows_np(rows)
        # traced state (jit_fn): tables arrive as tracer arguments; gather
        # rows in-graph so the program carries no multi-MB constants.
        idx = jnp.asarray(rows, jnp.int32)
        t = self.ptables
        return PallasNttTables(
            *(jnp.take(x, idx, axis=0) for x in t[:7]),
            logn=t.logn,
            lanes=t.lanes,
        )

    @functools.lru_cache(maxsize=None)
    def _ptables_rows_np(self, rows: tuple[int, ...]) -> PallasNttTables:
        idx = np.asarray(rows, np.int64)
        t = self.ptables
        return PallasNttTables(
            tw1=t.tw1[idx],
            tw2=t.tw2[idx],
            twi2=t.twi2[idx],
            twi1=t.twi1[idx],
            ninv=t.ninv[idx],
            q=t.q[idx],
            q_neg_inv=t.q_neg_inv[idx],
            logn=t.logn,
            lanes=t.lanes,
        )

    # -- NTT dispatch: every device-path transform goes through these -----
    # ``_ntt_override`` lets a distributed wrapper (parallel/sp.py) reroute
    # the transforms to coefficient-sharded collective implementations while
    # reusing every compound kernel (keyswitch, rescale, mod-down) verbatim.
    def _ntt(self, x, rows: tuple[int, ...]):
        if self._ntt_override is not None:
            return self._ntt_override[0](x, rows)
        if self.ntt_impl == "pallas":
            return ntt_pl(
                x, self._ptables_rows(rows), interpret=self._pl_interpret
            )
        return ntt(x, self._tables_rows(rows))

    def _intt(self, x, rows: tuple[int, ...]):
        if self._ntt_override is not None:
            return self._ntt_override[1](x, rows)
        if self.ntt_impl == "pallas":
            return intt_pl(
                x, self._ptables_rows(rows), interpret=self._pl_interpret
            )
        return intt(x, self._tables_rows(rows))

    @functools.lru_cache(maxsize=None)
    def _qrows(self, rows: tuple[int, ...]):
        """(q, q_neg_inv, r2) numpy u32 arrays shaped [len(rows), 1]."""
        idx = np.asarray(rows, np.int64)
        return (
            self._q_np[idx][:, None],
            self._qinv_np[idx][:, None],
            self._r2_np[idx][:, None],
        )

    def _ql(self, l: int):
        return self._qrows(tuple(range(l)))

    @functools.lru_cache(maxsize=None)
    def _conv_group(self, g_start: int, g_len: int, l: int) -> ConvTables:
        """Digit group prefix [g_start, g_start+g_len) -> basis Q_l * P."""
        p = self.params
        src = p.moduli[g_start : g_start + g_len]
        tgt = p.moduli[:l] + p.special
        return make_conv_tables(tuple(src), tuple(tgt))

    @functools.lru_cache(maxsize=None)
    def _skip_rows(self, g_start: int, g_len: int, l: int) -> tuple[int, ...]:
        """Extended-basis rows OUTSIDE digit [g_start, g_start+g_len):
        fast base conversion is *exact* on primes inside the source base
        (every cross term carries the target prime as a factor), so the
        in-digit rows of the decomposition are just the original residues
        and never leave the NTT domain."""
        return (
            tuple(range(g_start))
            + tuple(range(g_start + g_len, l))
            + tuple(range(self.L, self.n_all))
        )

    @functools.lru_cache(maxsize=None)
    def _conv_group_skip(self, g_start: int, g_len: int, l: int) -> ConvTables:
        """Digit group -> (Q_l * P minus the digit's own primes)."""
        p = self.params
        src = p.moduli[g_start : g_start + g_len]
        tgt = tuple(
            p.all_primes[i] for i in self._skip_rows(g_start, g_len, l)
        )
        return make_conv_tables(tuple(src), tgt)

    @functools.lru_cache(maxsize=None)
    def _conv_special(self, l: int) -> ConvTables:
        p = self.params
        return make_conv_tables(p.special, p.moduli[:l])

    # ------------------------------------------------------------------
    # evaluation-point bookkeeping (exponent map, automorphisms)
    # ------------------------------------------------------------------
    def _compute_exponent_map(self):
        """e_map[i]: NTT output index i holds m(psi^{e_map[i]}).

        Computed structurally once per context by transforming X with a host
        NTT and discrete-logging against a psi power table (exact ints).
        """
        p = self.params
        n, two_n = p.n, p.two_n
        q = p.all_primes[0]
        from ..core.ntt import _primitive_2n_root

        psi = _primitive_2n_root(q, two_n)
        # host NTT of the monomial X
        from ..core.ntt import _pow_table

        brev = bit_reverse_perm(p.logn)
        pows = _pow_table(
            np.asarray([psi], np.uint64), np.asarray([q], np.uint64), n
        )[0]
        psi_br = pows[brev]
        x = np.zeros(n, np.uint64)
        x[1] = 1
        for s in range(p.logn):
            m = 1 << s
            half = n >> (s + 1)
            xs = x.reshape(m, 2, half)
            S = psi_br[m : 2 * m].reshape(m, 1)
            U, V = xs[:, 0], xs[:, 1] * S % q
            x = np.stack([(U + V) % q, (U + q - V) % q], 1).reshape(n)
        full = _pow_table(
            np.asarray([psi], np.uint64), np.asarray([q], np.uint64), two_n
        )[0]
        order = np.argsort(full)
        pos = np.searchsorted(full[order], x)
        assert (full[order][pos] == x).all()
        e_map = order[pos].astype(np.int64)
        inv_e = np.full(two_n, -1, np.int64)
        inv_e[e_map] = np.arange(n)
        return e_map, inv_e

    def _compute_pnh_mont(self) -> jnp.ndarray:
        """NTT-domain values of X^{N/2} per prime, Montgomery form: [L+K, N]."""
        p = self.params
        exps = (self._e_map * (p.n // 2)) % p.two_n
        from ..core.ntt import _primitive_2n_root, _pow_table

        qv = np.asarray(p.all_primes, np.uint64)
        roots = np.asarray(
            [_primitive_2n_root(int(q), p.two_n) for q in qv], np.uint64
        )
        # psi^t for every t, then Montgomery-form and gather the exponents
        table = _pow_table(roots, qv, p.two_n)  # [L+K, 2N] u64
        sel = table[:, exps]  # [L+K, N]
        out = ((sel << np.uint64(32)) % qv[:, None]).astype(np.uint32)
        return jnp.asarray(out)

    def galois_element_for_rotation(self, delta: int) -> int:
        """Galois element realizing a slot rotation by ``delta``.

        Semantics (locked by tests/test_ckks.py::test_rotate):
        decode(rotate(ct, d)) == np.roll(decode(ct), d).  With the generator-5
        slot ordering this is sigma_g with g = 5^{-d} mod 2N.
        """
        p = self.params
        return pow(5, (-delta) % p.n_slots, p.two_n)

    @functools.lru_cache(maxsize=None)
    def _galois_perm(self, g: int) -> np.ndarray:
        e = self._e_map
        perm = self._inv_e[(e * g) % self.params.two_n]
        assert (perm >= 0).all()
        return perm.astype(np.int32)  # numpy: trace-safe constant

    # ------------------------------------------------------------------
    # keygen
    # ------------------------------------------------------------------
    def _ntt_host_rows(self, res: np.ndarray, rows: tuple[int, ...]):
        """Device NTT of host residues for the given prime rows (eager)."""
        t = self._tables_rows(rows)
        return ntt_jit_rows(jnp.asarray(res), t)

    def _next_jkey(self) -> jnp.ndarray:
        self._jkey_counter += 1
        return jax.random.fold_in(self._jroot, self._jkey_counter)

    def _g_mont(self) -> np.ndarray:
        """Gadget factors g_j * R mod c: [J, L+K, 1] u32 (trace-safe const)."""
        if self._g_mont_np is None:
            gadget = gadget_residues(self.params)  # [J, L+K] standard
            self._g_mont_np = _u32(
                (gadget.astype(np.uint64) << np.uint64(32))
                % self._q_np.astype(np.uint64)[None, :]
            )[:, :, None]
        return self._g_mont_np

    def _keygen(self) -> KeySet:
        p = self.params
        raw = sample_keys_host(p, self._rng, self.secret_hamming)
        all_rows = tuple(range(self.n_all))
        q, qi, r2 = self._qrows(all_rows)

        s_res = small_poly_residues(raw["s_coeff"], p.all_primes)
        s_ntt = self._ntt_host_rows(s_res, all_rows)
        s_mont = mont_mul(s_ntt, r2, q, qi)
        self._s_mont = s_mont  # used by _make_switching_key

        # public key over Q only: a sampled on device, e shipped as coeffs
        if "pk" not in self._ks_jit:
            self._ks_jit["pk"] = jax.jit(self._pk_impl)
        pk_mont = self._ks_jit["pk"](
            self._next_jkey(),
            jnp.asarray(raw["pk_e_coeff"], jnp.int32),
            s_mont[: self.L],
        )

        # relinearization key: switch s^2 -> s
        s2_std = mont_mul(s_ntt, s_mont, q, qi)  # s x s*R / R = s^2, standard
        rlk = self._make_switching_key(s2_std)
        return KeySet(
            secret_mont=s_mont, secret_ntt=s_ntt, pk=pk_mont, relin=rlk
        )

    def _uniform_device(self, jkey, shape, q, qi, r2, mu):
        """Uniform residues in [0, q) sampled on device: a 64-bit string per
        lane, reduced as hi*2^32 + lo mod q (bias <= q/2^64).  q/qi/r2/mu are
        [rows, 1] and broadcast against ``shape`` = [..., rows, N]."""
        bits = jax.random.bits(jkey, (2, *shape), dtype=jnp.uint32)
        hi = mont_mul(bits[0], r2, q, qi)  # hi * R^2 / R = hi * 2^32 mod q
        lo = barrett_reduce(bits[1], q, mu)
        return add_mod(hi, lo, q)

    def _small_residues_traced(self, e32: jnp.ndarray, rows) -> jnp.ndarray:
        """Signed small coeffs [..., N] int32 -> residues [..., rows, N] u32
        (device-side small_poly_residues; avoids shipping [rows, N] arrays)."""
        q_i32 = np.asarray(self._q_np[list(rows)], np.int32)[:, None]
        e = e32[..., None, :]
        return jnp.where(e < 0, e + q_i32, e).astype(jnp.uint32)

    def _pk_impl(self, jkey, e32, s_mont_q):
        p = self.params
        rows = tuple(range(self.L))
        q, qi, r2 = self._ql(self.L)
        mu = self._mu_np[: self.L][:, None]
        a = self._uniform_device(jkey, (self.L, p.n), q, qi, r2, mu)
        e = self._ntt(self._small_residues_traced(e32, rows), rows)
        b = add_mod(neg_mod(mont_mul(a, s_mont_q, q, qi), q), e, q)
        return mont_mul(jnp.stack([b, a]), r2, q, qi)

    def _make_switching_key(self, target_ntt: jnp.ndarray) -> "SwitchingKey":
        """ksk_j = (-a_j s + e_j + g_j * target, a_j) over Q*P, Montgomery —
        returned SEED-COMPRESSED (keys.SwitchingKey): only b is materialized;
        the uniform a_j regenerate from the threefry key at each key switch.

        ``target_ntt``: the source secret (s^2 or sigma_g(s)) in NTT domain,
        *standard* form.  The whole construction is ONE jitted program
        reused for the relin key and every Galois key.
        """
        p = self.params
        J = len(p.groups)
        e32 = np.rint(
            self._rng.normal(0.0, 3.2, size=(J, p.n))
        ).astype(np.int32)
        if "mksk" not in self._ks_jit:
            self._ks_jit["mksk"] = jax.jit(self._mksk_impl)
        jkey = self._next_jkey()
        b_mont = self._ks_jit["mksk"](
            jkey, target_ntt, jnp.asarray(e32), self._s_mont
        )
        return SwitchingKey(b_mont=b_mont, jkey=jkey)

    def _key_a_std(self, jkey) -> jnp.ndarray:
        """The uniform a-parts of a switching key, standard form
        [J, L+K, N] — deterministic in ``jkey`` (used both at construction
        and at every key switch; bit-identical by PRNG determinism)."""
        p = self.params
        J = len(p.groups)
        all_rows = tuple(range(self.n_all))
        q, qi, r2 = self._qrows(all_rows)
        mu = self._mu_np[:, None]
        return self._uniform_device(
            jkey, (J, self.n_all, p.n), q, qi, r2, mu
        )

    def _mksk_impl(self, jkey, target_ntt, e32, s_mont):
        p = self.params
        all_rows = tuple(range(self.n_all))
        q, qi, r2 = self._qrows(all_rows)
        a = self._key_a_std(jkey)
        e = self._ntt(self._small_residues_traced(e32, all_rows), all_rows)
        g_mont = self._g_mont()  # [J, rows, 1] numpy const
        gs = mont_mul(target_ntt[None], g_mont, q, qi)
        neg_as = neg_mod(mont_mul(a, s_mont[None], q, qi), q)
        b = add_mod(add_mod(neg_as, e, q), gs, q)
        return mont_mul(b, r2, q, qi)  # [J, L+K, N]

    def install_keys(self, keys: KeySet) -> None:
        """Install a persisted KeySet (see utils/serialization.py) into a
        context built with ``keygen=False`` — bit-identical to the context
        that generated it (same params/seed).  Later ``add_galois_keys``
        calls still work: they only need the secret, which the set carries."""
        self.keys = keys
        self._s_mont = keys.secret_mont
        self._jnp_state = None

    def materialize_key_a(self, budget_bytes: int | None = None) -> int:
        """Precompute the Montgomery-form a-parts of the relin + Galois keys
        (undoing seed-compression for the hot path): each key switch then
        skips the on-device threefry regeneration + Montgomery conversion of
        a [J, L+K, N] tensor — pure HBM-for-compute trade.

        ``budget_bytes`` caps the extra HBM (relin first, then Galois keys in
        insertion order).  Returns the bytes actually materialized."""
        all_rows = tuple(range(self.n_all))
        q, qi, r2 = self._qrows(all_rows)
        per_key = (
            len(self.params.groups) * self.n_all * self.params.n * 4
        )
        spent = 0

        def mat(sk: SwitchingKey) -> SwitchingKey:
            if sk.a_mont is not None:
                return sk
            ka = self._key_a_std(sk.jkey)
            return sk._replace(a_mont=mont_mul(ka, r2, q, qi))

        todo = [("relin", None)] + [("galois", g) for g in self.keys.galois]
        for kind, g in todo:
            if budget_bytes is not None and spent + per_key > budget_bytes:
                break
            if kind == "relin":
                self.keys.relin = mat(self.keys.relin)
            else:
                self.keys.galois[g] = mat(self.keys.galois[g])
            spent += per_key
        self._jnp_state = None  # keys changed shape: re-snapshot
        return spent

    def add_galois_keys(self, elements, chunk: int = 16) -> None:
        """Create switching keys for sigma_g(s) -> s for each Galois element.

        All keys of a chunk are generated in ONE vmapped device program
        (per-key dispatch through this environment's host<->TPU tunnel
        costs seconds each; keygen is dispatch-bound, not compute-bound)."""
        p = self.params
        new: list[int] = []
        for g in elements:
            g = int(g) % p.two_n
            if g not in self.keys.galois and g != 1 and g not in new:
                new.append(g)
        if not new:
            return
        self._jnp_state = None  # invalidate the traced-state snapshot
        J = len(p.groups)
        if "mksk_v" not in self._ks_jit:
            self._ks_jit["mksk_v"] = jax.jit(
                jax.vmap(self._mksk_impl, in_axes=(0, 0, 0, None))
            )
        for c0 in range(0, len(new), chunk):
            gs = new[c0 : c0 + chunk]
            perms = np.stack([self._galois_perm(g) for g in gs])
            s_gs = jnp.take(
                self.keys.secret_ntt, jnp.asarray(perms), axis=-1
            ).transpose(1, 0, 2)  # [G, L+K, N]
            e32 = np.rint(
                self._rng.normal(0.0, 3.2, size=(len(gs), J, p.n))
            ).astype(np.int32)
            jkeys = jnp.stack([self._next_jkey() for _ in gs])
            b_monts = self._ks_jit["mksk_v"](
                jkeys, s_gs, jnp.asarray(e32), self._s_mont
            )
            for i, g in enumerate(gs):
                self.keys.galois[g] = SwitchingKey(
                    b_mont=b_monts[i], jkey=jkeys[i]
                )

    # ------------------------------------------------------------------
    # encode / encrypt / decrypt (host boundary)
    # ------------------------------------------------------------------
    def default_scale(self) -> Fraction:
        return Fraction(self.params.scale)

    def encrypt(
        self,
        values: np.ndarray,
        limbs: int | None = None,
        scale: Fraction | None = None,
    ) -> Ciphertext:
        """Encrypt complex slot values [..., n_slots] under the public key."""
        p = self.params
        l = self.L if limbs is None else limbs
        scale = self.default_scale() if scale is None else scale
        values = np.asarray(values, np.complex128)
        batch = values.shape[:-1]
        coeffs = (
            self.encoder.values_to_coeffs(values, scale)
            if not batch
            else np.stack(
                [self.encoder.values_to_coeffs(v, scale) for v in values.reshape(-1, p.n_slots)]
            ).reshape(*batch, p.n)
        )
        m_res = (
            self.encoder.to_residues(coeffs, p.moduli[:l])
            if not batch
            else np.stack(
                [
                    self.encoder.to_residues(c, p.moduli[:l])
                    for c in coeffs.reshape(-1, p.n)
                ]
            ).reshape(*batch, l, p.n)
        )
        rows = tuple(range(l))
        # v/e0/e1 are tiny signed coeffs: ship [..., 3, N] int32 and expand
        # to residues on device (vs ~3 x [l, N] u32 over the slow tunnel);
        # independent randomness per batch element
        small = np.stack(
            [
                np.stack(
                    [
                        _ternary_coeffs(self._rng, p.n),
                        _gaussian_coeffs(self._rng, p.n),
                        _gaussian_coeffs(self._rng, p.n),
                    ]
                )
                for _ in range(int(np.prod(batch)) if batch else 1)
            ]
        ).astype(np.int32)
        small = small.reshape(*batch, 3, p.n) if batch else small[0]
        if ("encrypt", l) not in self._ks_jit:
            self._ks_jit[("encrypt", l)] = jax.jit(
                functools.partial(self._encrypt_impl, rows=rows)
            )
        data = self._ks_jit[("encrypt", l)](
            jnp.asarray(m_res), jnp.asarray(small), self.keys.pk[:, :l]
        )
        return Ciphertext(data=data, scale=scale, ntt=True)

    def _encrypt_impl(self, m_res, small, pk_mont, rows):
        """ct = (v*pk0 + e0 + m, v*pk1 + e1), all NTT domain."""
        l = len(rows)
        q, qi, _ = self._ql(l)
        res = self._small_residues_traced(small, rows)  # [..., 3, l, N]
        v = self._ntt(res[..., 0, :, :], rows)
        e0 = self._ntt(res[..., 1, :, :], rows)
        e1 = self._ntt(res[..., 2, :, :], rows)
        m = self._ntt(m_res, rows)
        c0 = add_mod(add_mod(mont_mul(v, pk_mont[0], q, qi), e0, q), m, q)
        c1 = add_mod(mont_mul(v, pk_mont[1], q, qi), e1, q)
        return jnp.stack([c0, c1], axis=-3)

    def decrypt_values(self, ct: Ciphertext) -> np.ndarray:
        """Decrypt to complex slot values (host CRT + embedding decode)."""
        p = self.params
        l = ct.n_limbs
        res = np.asarray(
            _decrypt_device(
                ct.data, self.keys.secret_mont[:l], self._tab(l), ct.ntt
            )
        )
        if ct.batch_shape:
            flat = res.reshape(-1, l, p.n)
            vals = np.stack(
                [
                    self.encoder.residues_to_values(r, p.moduli[:l], ct.scale)
                    for r in flat
                ]
            )
            return vals.reshape(*ct.batch_shape, p.n_slots)
        return self.encoder.residues_to_values(res, p.moduli[:l], ct.scale)

    def encode_plain(
        self, values: np.ndarray, scale: Fraction, limbs: int
    ) -> Plaintext:
        """Full-vector plaintext (masks etc.): NTT-domain Montgomery form.

        Encoded entirely on HOST (numpy NTT): plaintext caches are built
        lazily from op code that may be mid-trace under jit, and a device
        NTT there would cache leaked tracers."""
        p = self.params
        coeffs = self.encoder.values_to_coeffs(
            np.asarray(values, np.complex128), scale
        )
        res = self.encoder.to_residues(coeffs, p.moduli[:limbs])
        rows = tuple(range(limbs))
        t = self._tables_rows_np(rows)
        q, qi, r2 = self._qrows(rows)
        data = _host_mont_mul(ntt_host(res, t), r2, q, qi)
        if _trace_state_clean():
            data = jnp.asarray(data)
        # mid-trace: keep numpy (concrete, cache-safe); callers upgrade via
        # plain_device() once no trace is active
        return Plaintext(data=data, scale=scale)

    def plain_device(self, pt: Plaintext) -> Plaintext:
        """Move a (possibly numpy-backed) cached plaintext to the device —
        only outside traces, so lazily-built plaintext caches never hold
        tracers yet avoid re-uploading constants on every eager use."""
        if isinstance(pt.data, np.ndarray) and _trace_state_clean():
            return Plaintext(data=jnp.asarray(pt.data), scale=pt.scale)
        return pt

    def _const_res_np(
        self, c: complex, scale: Fraction, limbs: int
    ) -> tuple[np.ndarray, np.ndarray]:
        """Montgomery residues of (Re(c)*scale, -Im(c)*scale): two [limbs]
        u32 numpy arrays (the X^{N/2} slot-constant decomposition)."""
        a_int = int(round(float(Fraction(c.real) * scale)))
        b_int = int(round(float(Fraction(-c.imag) * scale)))
        qs = self.params.moduli[:limbs]
        a_res = _u32([(a_int % q) * _R % q for q in qs])
        b_res = _u32([(b_int % q) * _R % q for q in qs])
        return a_res, b_res

    def const_scalars(
        self, c: complex, scale: Fraction, limbs: int
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Slot-constant plaintext as per-limb scalars (a_res, b_res), each
        [limbs] u32 *Montgomery form*, for const = a + b*X^{N/2} with
        a = Re(c)*scale, b = -Im(c)*scale."""
        a_res, b_res = self._const_res_np(c, scale, limbs)
        return jnp.asarray(a_res), jnp.asarray(b_res)

    def ladder(self) -> tuple[Fraction, int]:
        """(scale, per-multiply rescale drop) for precision-critical power
        ladders (the degree-255 BSGS S-box, the snap's x^16 chain, the
        bootstrap interior).

        On depth-diet chains (Δ=2^29) the ladder noise floor at the chain
        scale — keyswitch noise ~2^-19 relative, doubled per squaring,
        amplified by the polynomial derivative in the accumulation — decodes
        wrong at N=2^15 (measured on the chip: 16% of S-box bytes).  Running
        ladders at Δ² = 2^58 (a rescale drops TWO primes) restores the deep
        chain's floor; scales are exact Fractions so the boost into the
        elevated tier is one exact integer multiply, and eval_lut_2d's
        exact scale targeting lands the result back at Δ."""
        p = self.params
        if p.scale >= (1 << 40) or not self.ladder_elevate:
            return Fraction(p.scale), p.rescale_drop
        return Fraction(p.scale) * Fraction(p.scale), 2 * p.rescale_drop

    # ------------------------------------------------------------------
    # pure device verbs (jit-composable)
    # ------------------------------------------------------------------
    def align(self, *cts: Ciphertext) -> list[Ciphertext]:
        l = min(ct.n_limbs for ct in cts)
        return [self.drop_limbs(ct, ct.n_limbs - l) for ct in cts]

    def drop_limbs(self, ct: Ciphertext, k: int) -> Ciphertext:
        if k == 0:
            return ct
        return ct.with_data(ct.data[..., : ct.n_limbs - k, :])

    def add(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self.align(a, b)
        assert a.scale == b.scale, (a.scale, b.scale)
        q, _, _ = self._ql(a.n_limbs)
        return a.with_data(add_mod(a.data, b.data, q))

    def sub(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        a, b = self.align(a, b)
        assert a.scale == b.scale
        q, _, _ = self._ql(a.n_limbs)
        return a.with_data(sub_mod(a.data, b.data, q))

    def neg(self, a: Ciphertext) -> Ciphertext:
        q, _, _ = self._ql(a.n_limbs)
        return a.with_data(neg_mod(a.data, q))

    def mul_scalar(self, ct: Ciphertext, c: complex, scale: Fraction) -> Ciphertext:
        """Multiply by a slot-constant complex scalar encoded at ``scale``.
        No rescale; output scale = ct.scale * scale."""
        l = ct.n_limbs
        a_res, b_res = self.const_scalars(c, scale, l)
        q, qi, _ = self._ql(l)
        d = mont_mul(ct.data, a_res[:, None], q, qi)
        if abs(c.imag) > 0:
            t = mont_mul(ct.data, self._pnh_mont[:l], q, qi)
            d = add_mod(d, mont_mul(t, b_res[:, None], q, qi), q)
        return Ciphertext(data=d, scale=ct.scale * scale, ntt=ct.ntt)

    def mul_scalar_batched(
        self, ct: Ciphertext, cs, scale: Fraction
    ) -> Ciphertext:
        """Multiply by B different slot-constants at once: output batch axis
        B broadcast against ct (which may be unbatched or [B, ...]-batched).
        One kernel pass instead of B mul_scalar dispatches — the workhorse of
        batched LUT evaluation (aes/lut_eval.py with stacked coefficients)."""
        l = ct.n_limbs
        cs = [complex(c) for c in cs]
        ab = [self._const_res_np(c, scale, l) for c in cs]
        a = jnp.asarray(np.stack([x[0] for x in ab]))[:, None, :, None]
        q, qi, _ = self._ql(l)
        d = mont_mul(ct.data, a, q, qi)
        if any(abs(c.imag) > 0 for c in cs):
            b = jnp.asarray(np.stack([x[1] for x in ab]))[:, None, :, None]
            t = mont_mul(ct.data, self._pnh_mont[:l], q, qi)
            d = add_mod(d, mont_mul(t, b, q, qi), q)
        else:
            d = jnp.broadcast_to(d, (len(cs), *d.shape[-3:]))
        return Ciphertext(data=d, scale=ct.scale * scale, ntt=ct.ntt)

    def add_const_batched(self, ct: Ciphertext, cs) -> Ciphertext:
        """Add B different slot-constants (encoded at ct.scale) to a
        [B, ...]-batched (or broadcastable) ciphertext."""
        l = ct.n_limbs
        cs = [complex(c) for c in cs]
        B = len(cs)
        qs = self.params.moduli[:l]
        a_std = np.stack(
            [
                _u32([int(round(float(Fraction(c.real) * ct.scale))) % q for q in qs])
                for c in cs
            ]
        )
        b_std = np.stack(
            [
                _u32([int(round(float(Fraction(-c.imag) * ct.scale))) % q for q in qs])
                for c in cs
            ]
        )
        q, qi, _ = self._ql(l)
        vec = mont_mul(
            self._pnh_mont[None, :l], jnp.asarray(b_std)[:, :, None], q, qi
        )
        vec = add_mod(vec, jnp.asarray(a_std)[:, :, None], q)  # [B, l, N]
        data = jnp.broadcast_to(
            ct.data, (B, *ct.data.shape[-3:])
        ) if ct.data.ndim == 3 else ct.data
        d0 = add_mod(data[..., 0, :, :], vec, q)
        d = jnp.concatenate(
            [d0[..., None, :, :], data[..., 1:, :, :]], axis=-3
        )
        return ct.with_data(d)

    def const_scalars_std(
        self, c: complex, scale: Fraction, limbs: int
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Like const_scalars but standard (non-Montgomery) form."""
        a_int = int(round(float(Fraction(c.real) * scale)))
        b_int = int(round(float(Fraction(-c.imag) * scale)))
        qs = self.params.moduli[:limbs]
        return (
            jnp.asarray(_u32([a_int % q for q in qs])),
            jnp.asarray(_u32([b_int % q for q in qs])),
        )

    def add_const(self, ct: Ciphertext, c: complex) -> Ciphertext:
        """Add a slot-constant encoded at the ciphertext's own scale.

        The constant's NTT vector is a_std + b_std * pnh (closed form; pnh =
        NTT of X^{N/2}), so this is one scalar multiply and two adds."""
        l = ct.n_limbs
        a_std, b_std = self.const_scalars_std(c, ct.scale, l)
        q, qi, _ = self._ql(l)
        vec = mont_mul(self._pnh_mont[:l], b_std[:, None], q, qi)  # b*pnh, std
        vec = add_mod(vec, jnp.broadcast_to(a_std[:, None], vec.shape), q)
        d0 = add_mod(ct.data[..., 0, :, :], vec, q)
        d = jnp.concatenate(
            [d0[..., None, :, :], ct.data[..., 1:, :, :]], axis=-3
        )
        return ct.with_data(d)

    def mul_plain(self, ct: Ciphertext, pt: Plaintext) -> Ciphertext:
        l = min(ct.n_limbs, pt.n_limbs)
        ct = self.drop_limbs(ct, ct.n_limbs - l)
        q, qi, _ = self._ql(l)
        d = mont_mul(ct.data, pt.data[: l], q, qi)
        return Ciphertext(data=d, scale=ct.scale * pt.scale, ntt=ct.ntt)

    def tensor(self, a: Ciphertext, b: Ciphertext) -> Ciphertext:
        """ct x ct tensor product -> 3-poly ciphertext (lazy relinearize)."""
        a, b = self.align(a, b)
        q, qi, r2 = self._ql(a.n_limbs)
        bm = mont_mul(b.data, r2, q, qi)
        a0, a1 = a.data[..., 0, :, :], a.data[..., 1, :, :]
        b0, b1 = bm[..., 0, :, :], bm[..., 1, :, :]
        d0 = mont_mul(a0, b0, q, qi)
        d1 = add_mod(mont_mul(a0, b1, q, qi), mont_mul(a1, b0, q, qi), q)
        d2 = mont_mul(a1, b1, q, qi)
        return Ciphertext(
            data=jnp.stack([d0, d1, d2], axis=-3),
            scale=a.scale * b.scale,
            ntt=True,
        )

    def relinearize(self, ct: Ciphertext) -> Ciphertext:
        assert ct.n_poly == 3
        l = ct.n_limbs
        d2 = ct.data[..., 2, :, :]
        ks0, ks1 = self._keyswitch(d2, self.keys.relin, l)
        q, _, _ = self._ql(l)
        d0 = add_mod(ct.data[..., 0, :, :], ks0, q)
        d1 = add_mod(ct.data[..., 1, :, :], ks1, q)
        return ct.with_data(jnp.stack([d0, d1], axis=-3))

    def multiply(
        self, a: Ciphertext, b: Ciphertext, drop: int | None = None
    ) -> Ciphertext:
        """ct x ct with relinearization and rescale (reference auto-relin
        multiply, engine_context.py:65-68).  Rescale runs FIRST (on the
        3-poly tensor) so the relinearization key switch operates at
        ``drop`` fewer limbs — same result, cheaper dominant kernel.
        ``drop`` defaults to params.rescale_drop (2 on Δ=2^58 chains, 1 on
        Δ=2^29 single-prime chains)."""
        if drop is None:
            drop = self.params.rescale_drop
        out = self.rescale(self.tensor(a, b), drop)
        return self.relinearize(out)

    def rescale(self, ct: Ciphertext, k: int = 1) -> Ciphertext:
        for _ in range(k):
            ct = self._rescale_one(ct)
        return ct

    def to_scale(self, ct: Ciphertext, target: Fraction) -> Ciphertext:
        """Bring the declared scale close to ``target`` (within ~2^-21
        relative) by one scalar multiply + rescale(s).

        The integer multiplier a = round(target * prod(drops) / scale) is
        chosen first and the scalar declared at scale exactly Fraction(a),
        so the operation itself is exact; only the final scale misses
        ``target`` by the (tracked!) ratio a/(target*prod/scale).  Needed
        wherever scales wander far from the working scale (bootstrap) —
        large scale excess amplifies through power bases.
        """
        if ct.scale == target:
            return ct
        s_adj = target / ct.scale
        k = 0
        while s_adj < (1 << 18):
            k += 1
            assert ct.n_limbs - k >= self.params.n_base, (
                "to_scale: not enough limbs above the base"
            )
            s_adj = s_adj * self.params.moduli[ct.n_limbs - k]
        a = max(1, int(round(float(s_adj))))
        out = self.mul_scalar(ct, 1.0, Fraction(a))
        return self.rescale(out, k)

    def _rescale_one(self, ct: Ciphertext) -> Ciphertext:
        l = ct.n_limbs
        d = l - 1
        assert d >= self.params.n_base, "rescale would eat the base modulus"
        qd = self.params.moduli[d]
        if self._ntt_override is not None:
            out = self._rescale_impl(ct.data, d=d)
        else:
            if d not in self._rs_jit:
                self._rs_jit[d] = self._kernel_jit(self._rescale_impl, d=d)
            out = self._rs_jit[d](self._kstate(), ct.data)
        return Ciphertext(data=out, scale=ct.scale / qd, ntt=True)

    def _rescale_impl(self, data: jnp.ndarray, d: int) -> jnp.ndarray:
        qd = self.params.moduli[d]
        q, qi, _ = self._ql(d)
        mu = jnp.asarray(self._mu_np[:d])[:, None]
        qmod = jnp.asarray(self._qmod[d, :d])[:, None]
        invq = jnp.asarray(self._invq_mont[d, :d])[:, None]
        last = self._intt(data[..., d : d + 1, :], (d,))
        half = jnp.uint32((qd + 1) // 2)
        r = barrett_reduce(last, q, mu)
        r = jnp.where(last >= half, sub_mod(r, qmod, q), r)
        r_ntt = self._ntt(r, tuple(range(d)))
        return mont_mul(sub_mod(data[..., :d, :], r_ntt, q), invq, q, qi)

    # -- nested kernel jits: tables threaded as ARGUMENTS -----------------
    # The compound kernels (keyswitch, rescale, hoisted rotations) are
    # jax.jit'd with the twiddle tables passed as pytree arguments, and are
    # dispatched this way from BOTH the eager path and inside jit_fn traces.
    # Inside an outer trace a nested pjit's jaxpr is traced ONCE per
    # (signature) and cached — a big op program with ~45 keyswitches emits
    # 45 calls to one shared sub-jaxpr instead of inlining ~45 copies of the
    # body (round-2 finding: Python tracing of the inlined programs cost
    # ~67 s per op program at N=2^15, the driver-bench killer).  Threading
    # the tables as arguments (not closure state) is what makes the cached
    # jaxpr safe: no captured tracers, no multi-MB constants in the HLO.
    def _kstate(self):
        """Transform tables as a pytree argument for nested kernel jits.
        Live attributes while tracing (they are the outer trace's tracers);
        the cached concrete device snapshot otherwise.

        When a FOREIGN trace is active (a caller jitted ctx verbs directly,
        without jit_fn — so _traced_mode is False but jnp.asarray would
        return leakable tracers), pass the live numpy tables: they enter the
        outer program as constants, exactly like the pre-nested-jit path."""
        if self._traced_mode or (
            self._jnp_state is None and not _trace_state_clean()
        ):
            return (
                self.tables,
                tuple(self.ptables[:7]) if self.ptables is not None else None,
            )
        st = self.traced_state()
        return (st["tables"], st["ptables_arrays"])

    def _swap_kstate(self, ks):
        old = (self.tables, self.ptables, self._traced_mode)
        self.tables = ks[0]
        if ks[1] is not None:
            self.ptables = PallasNttTables(
                *ks[1], logn=self.ptables.logn, lanes=self.ptables.lanes
            )
        self._traced_mode = True
        return old

    def _restore_kstate(self, old):
        self.tables, self.ptables, self._traced_mode = old

    def _kernel_jit(self, impl, **static):
        fn = functools.partial(impl, **static) if static else impl

        def wrapped(ks, *args):
            old = self._swap_kstate(ks)
            try:
                return fn(*args)
            finally:
                self._restore_kstate(old)

        return jax.jit(wrapped)

    # -- key switching ---------------------------------------------------
    def _keyswitch(self, a: jnp.ndarray, ksk: jnp.ndarray, l: int):
        """Hybrid key switch of a single poly a [..., l, N] (NTT) with key
        ksk [J, 2, L+K, N].  Returns (d0, d1) over Q_l, NTT domain.

        Jitted per limb count: the key switch is by far the most frequent
        compound kernel (every relinearize / rotate / conjugate), so it gets
        its own compiled program instead of hundreds of eager dispatches —
        and inside jit_fn programs it rides the nested-jit jaxpr cache.
        """
        self.stats["keyswitch"] += 1
        if self._ntt_override is not None:
            return self._keyswitch_impl(a, ksk, l=l)
        if l not in self._ks_jit:
            self._ks_jit[l] = self._kernel_jit(self._keyswitch_impl, l=l)
        return self._ks_jit[l](self._kstate(), a, ksk)

    def _decompose_ext(self, a: jnp.ndarray, l: int) -> jnp.ndarray:
        """Gadget decomposition of poly ``a`` [..., l, N] (NTT): iNTT, split
        into digit groups, base-extend each to Q_l*P, and NTT back — stacked
        as ONE wide transform [..., J', l+K, N] (one kernel launch instead of
        one per group).

        In-digit rows never leave the NTT domain: FastBaseConv is exact on
        target primes dividing the source base (every cross term carries the
        target prime as a factor), so digit j's own rows of the decomposition
        ARE the original residues — only the complement rows are converted
        and transformed (saves l of the J'*(l+K) NTT rows plus the matching
        conversion columns, bit-identically)."""
        p = self.params
        a_coeff = self._intt(a, tuple(range(l)))
        groups: list[tuple[int, int]] = []
        chunks = []
        rows_cat: list[int] = []
        for grp in p.groups:
            g0 = grp[0]
            m = min(len(grp), max(0, l - g0))
            if m <= 0:
                break
            chunks.append(
                base_convert(
                    a_coeff[..., g0 : g0 + m, :],
                    self._conv_group_skip(g0, m, l),
                    self._conv_plane,
                )
            )
            rows_cat.extend(self._skip_rows(g0, m, l))
            groups.append((g0, m))
        conv_ntt = self._ntt(jnp.concatenate(chunks, axis=-2), tuple(rows_cat))
        exts = []
        off = 0
        for g0, m in groups:
            n_tj = l - m + (self.n_all - self.L)
            cj = conv_ntt[..., off : off + n_tj, :]
            off += n_tj
            exts.append(
                jnp.concatenate(
                    [cj[..., :g0, :], a[..., g0 : g0 + m, :], cj[..., g0:, :]],
                    axis=-2,
                )
            )
        return jnp.stack(exts, axis=-3)  # [..., J', l+K, N]

    def _ks_inner(self, ext: jnp.ndarray, ksk, l: int):
        """Key inner product + mod-down for a decomposed poly: returns
        (d0, d1), each [..., l, N].  Both output polys and all digit groups
        ride one fused multiply-accumulate.  ``ksk`` is a seed-compressed
        SwitchingKey: its a-parts regenerate here from the threefry key."""
        ext_rows = self._rows_ext(l)
        q_ext, qi_ext, r2_ext = self._qrows(ext_rows)
        key_rows = np.asarray(ext_rows, np.int64)
        jn = ext.shape[-3]
        kb = ksk.b_mont[:jn][:, key_rows]        # [J', l+K, N]
        if ksk.a_mont is not None:               # materialized (HBM trade)
            ka = ksk.a_mont[:jn][:, key_rows]
        else:
            ka = self._key_a_std(ksk.jkey)[:jn][:, key_rows]
            ka = mont_mul(ka, r2_ext, q_ext, qi_ext)  # Montgomery form
        k01 = jnp.stack([kb, ka], axis=1)        # [J', 2, l+K, N]
        t = mont_mul(ext[..., :, None, :, :], k01, q_ext, qi_ext)
        acc = t[..., 0, :, :, :]
        for j in range(1, jn):
            acc = add_mod(acc, t[..., j, :, :, :], q_ext)  # [..., 2, l+K, N]
        down = self._mod_down(acc, l)            # [..., 2, l, N]
        return down[..., 0, :, :], down[..., 1, :, :]

    def _keyswitch_impl(self, a: jnp.ndarray, ksk: jnp.ndarray, l: int):
        ext = self._decompose_ext(a, l)
        return self._ks_inner(ext, ksk, l)

    def _mod_down(self, x: jnp.ndarray, l: int) -> jnp.ndarray:
        """Divide by P: x over Q_l*P [..., l+K, N] -> [..., l, N], NTT."""
        spec_rows = tuple(range(self.L, self.n_all))
        xs = self._intt(x[..., l:, :], spec_rows)
        conv = base_convert(xs, self._conv_special(l), self._conv_plane)
        conv = self._ntt(conv, tuple(range(l)))
        q, qi, _ = self._ql(l)
        pinv = jnp.asarray(self._pinv_mont[:l])[:, None]
        return mont_mul(sub_mod(x[..., :l, :], conv, q), pinv, q, qi)

    # -- reference-parity verbs ------------------------------------------
    def make_power_basis(self, ct: Ciphertext, d: int) -> list[Ciphertext]:
        """[ct^1 .. ct^d] — reference engine verb parity
        (engine_context.py:100-101); the AES layer uses the sparser
        coefficient-driven schedules in aes/lut_eval.py directly."""
        from ..aes.lut_eval import build_power_basis

        basis = build_power_basis(self, ct, set(range(1, d + 1)))
        return [basis[k] for k in range(1, d + 1)]

    def to_coeff(self, ct: Ciphertext) -> Ciphertext:
        """NTT -> coefficient domain (reference to_intt,
        engine_context.py:176-178)."""
        if not ct.ntt:
            return ct
        from dataclasses import replace

        return replace(
            ct,
            data=self._intt(ct.data, tuple(range(ct.n_limbs))),
            ntt=False,
        )

    def to_eval(self, ct: Ciphertext) -> Ciphertext:
        """Coefficient -> NTT domain (reference to_ntt)."""
        if ct.ntt:
            return ct
        from dataclasses import replace

        return replace(
            ct,
            data=self._ntt(ct.data, tuple(range(ct.n_limbs))),
            ntt=True,
        )

    def bootstrap_stats(self) -> dict:
        """Counter API parity with the reference's bootstrap accounting
        (engine_context.py:165-170)."""
        return dict(self.stats)

    # -- whole-program jit with state as arguments ------------------------
    def traced_state(self):
        """The large device arrays a jitted program must receive as
        *arguments* (inlining them as XLA constants produces multi-GB
        programs that kill the TPU compiler): twiddle tables, the X^{N/2}
        fast-path vector, and all key material.  Cached; invalidated when
        Galois keys are added."""
        if self._jnp_state is None:
            self._jnp_state = {
                "tables": NttTables(*(jnp.asarray(x) for x in self.tables)),
                # arrays only: logn/lanes are static and rebound at swap
                # time (as pytree leaves they would turn into tracers)
                "ptables_arrays": (
                    tuple(jnp.asarray(x) for x in self.ptables[:7])
                    if self.ptables is not None
                    else None
                ),
                "pnh": self._pnh_mont,
                "keys": {
                    "secret_mont": self.keys.secret_mont,
                    "secret_ntt": self.keys.secret_ntt,
                    "pk": self.keys.pk,
                    "relin": self.keys.relin,
                    "galois": dict(self.keys.galois),
                },
            }
        return self._jnp_state

    def _swap_state(self, st):
        old = (
            self.tables,
            self.ptables,
            self._pnh_mont,
            self.keys,
            self._traced_mode,
        )
        self.tables = st["tables"]
        if st.get("ptables_arrays") is not None:
            self.ptables = PallasNttTables(
                *st["ptables_arrays"],
                logn=self.ptables.logn,
                lanes=self.ptables.lanes,
            )
        self._pnh_mont = st["pnh"]
        k = st["keys"]
        self.keys = KeySet(
            secret_mont=k["secret_mont"],
            secret_ntt=k["secret_ntt"],
            pk=k["pk"],
            relin=k["relin"],
            galois=k["galois"],
        )
        self._traced_mode = True
        return old

    def _restore_state(self, old):
        (
            self.tables,
            self.ptables,
            self._pnh_mont,
            self.keys,
            self._traced_mode,
        ) = old

    def _export_cache(self):
        """Process-wide jax.export program cache (utils/export_cache.py),
        enabled by AES_FHE_EXPORT_CACHE_DIR.  Deserializing a cached program
        skips Python tracing AND StableHLO lowering — ~100 s/program at the
        bench config (DESIGN.md §13), the driver-budget killer."""
        import os

        d = os.environ.get("AES_FHE_EXPORT_CACHE_DIR", "")
        if not d:
            return None
        cache = getattr(CkksContext, "_export_cache_obj", None)
        if cache is None or str(cache.dir) != d:
            from ..utils.export_cache import ExportCache

            cache = ExportCache(d)
            CkksContext._export_cache_obj = cache
        return cache

    def _fingerprint(self) -> str:
        """Key material capturing everything that shapes a traced program
        besides the argument signature."""
        return repr(
            (self.params, self.ntt_impl, self.secret_hamming,
             self.ptables.lanes if self.ptables is not None else 0)
        )

    def jit_fn(self, fn, fallback: bool = True):
        """jax.jit a function of Ciphertext/array pytrees that internally
        uses this context's verbs.  Keys and twiddle tables are threaded as
        arguments so the compiled program contains no huge constants; while
        tracing, the per-kernel compound ops dispatch through nested jits
        whose jaxprs cache across programs.

        When AES_FHE_EXPORT_CACHE_DIR is set, each (program, signature)
        round-trips through jax.export: exported+serialized on first use,
        deserialized on later processes — skipping trace and lower.  The
        int-keyed dicts this package uses (Galois keysets, power bases) are
        bijectively renamed to string keys at the boundary — jax.export
        serializes only string-keyed dicts.

        With ``fallback`` (default), a backend/compiler failure (the remote
        TPU compiler in this environment kills very large programs)
        permanently downgrades this wrapper to eager execution."""

        def wrapped(targs, kwargs):
            st, *args = _intkeys(targs)
            kwargs = _intkeys(kwargs)
            old = self._swap_state(st)
            try:
                return _strkeys(fn(*args, **kwargs))
            finally:
                self._restore_state(old)

        jitted = jax.jit(wrapped)
        state = {"eager": False}
        base = getattr(fn, "func", fn)  # unwrap functools.partial
        tag = getattr(base, "__qualname__", getattr(base, "__name__", "fn"))

        def call(*args, **kwargs):
            if state["eager"]:
                return fn(*args, **kwargs)
            targs = _strkeys((self.traced_state(), *args))
            tkw = _strkeys(kwargs)
            cache = self._export_cache()
            runner = jitted
            if cache is not None:
                exp, _status = cache.get_or_build(
                    tag, self._fingerprint(), jitted, (targs, tkw)
                )
                if exp is not None:
                    runner = exp
            try:
                return _intkeys(runner(targs, tkw))
            except jax.errors.JaxRuntimeError as e:
                if not fallback:
                    raise
                import sys

                print(
                    f"jit_fn: backend rejected program for {tag}; eager "
                    f"fallback ({type(e).__name__}: {str(e)[:200]})",
                    file=sys.stderr,
                )
                state["eager"] = True
            return fn(*args, **kwargs)

        return call

    # -- automorphisms ----------------------------------------------------
    def rotate(self, ct: Ciphertext, delta: int) -> Ciphertext:
        g = self.galois_element_for_rotation(delta)
        return self.apply_galois(ct, g)

    def rotate_many(
        self, ct: Ciphertext, deltas: list[int]
    ) -> list[Ciphertext]:
        """Hoisted rotations: one gadget decomposition of the a-part shared
        by every rotation (the automorphism commutes with the per-limb digit
        decomposition), so each extra rotation costs only the key inner
        product + mod-down instead of a full iNTT/base-extend/NTT chain.
        """
        deltas = list(deltas)
        gs = [self.galois_element_for_rotation(d) for d in deltas]
        if len(deltas) <= 1:
            return [self.rotate(ct, d) for d in deltas]
        assert ct.n_poly == 2
        for g in gs:
            assert g == 1 or g in self.keys.galois, f"missing key g={g}"
        l = ct.n_limbs
        ksks = [
            self.keys.galois[g] if g != 1 else self.keys.relin for g in gs
        ]  # placeholder for g==1 never used in inner product
        if self._ntt_override is not None:
            datas = self._rotate_many_impl(ct.data, ksks, l=l, gs=tuple(gs))
        else:
            key = ("hoist", l, tuple(gs))
            if key not in self._ks_jit:
                self._ks_jit[key] = self._kernel_jit(
                    self._rotate_many_impl, l=l, gs=tuple(gs)
                )
            datas = self._ks_jit[key](self._kstate(), ct.data, ksks)
        return [ct.with_data(d) for d in datas]

    def _rotate_many_impl(self, data, ksks, l: int, gs: tuple[int, ...]):
        q, _, _ = self._ql(l)
        b, a = data[..., 0, :, :], data[..., 1, :, :]
        # shared decomposition of the *unrotated* a-part (the automorphism
        # commutes with the per-limb digit split)
        ext = self._decompose_ext(a, l)
        # Serialize the independent inner products when their combined
        # transients could pressure HBM (see _rma_impl: the scheduler
        # otherwise interleaves every rotation's ~16*B*J*(l+K)*N bytes of
        # temps).  Gated by estimated size so small hoisted batches (the
        # measured ShiftRows/MixColumns path) keep full scheduling freedom.
        import math as _math

        batch = _math.prod(data.shape[:-3]) if data.ndim > 3 else 1
        est = 16 * batch * len(self.params.groups) * self.n_all * self.params.n
        serialize = est * len(gs) > 2 << 30
        outs = []
        for gi, g in enumerate(gs):
            if g == 1:
                outs.append(data)
                continue
            perm = self._galois_perm(g)
            pe = jnp.take(ext, perm, axis=-1)
            d0, d1 = self._ks_inner(pe, ksks[gi], l)
            self.stats["keyswitch"] += 1
            d0 = add_mod(jnp.take(b, perm, axis=-1), d0, q)
            outs.append(jnp.stack([d0, d1], axis=-3))
            if serialize:
                ext, outs[-1] = jax.lax.optimization_barrier(
                    (ext, outs[-1])
                )
        return outs

    def rotate_mul_accum(
        self, ct: Ciphertext, deltas: list[int], pts: list[Plaintext]
    ) -> Ciphertext:
        """sum_i pt_i * rotate(ct, delta_i), then ONE rescale.

        The homomorphic-DFT stage / masked-permutation kernel: all rotations
        share one hoisted gadget decomposition, every plaintext multiply and
        the accumulation fuse into a single jitted program (delta 0 = the
        identity term).  Output scale: ct.scale * pt.scale / q_{l-1}."""
        assert ct.n_poly == 2
        l = ct.n_limbs
        s0 = pts[0].scale
        assert all(p.scale == s0 for p in pts), "equal plaintext scales"
        gs = tuple(
            self.galois_element_for_rotation(d) if d % self.params.n_slots else 1
            for d in deltas
        )
        for g in gs:
            assert g == 1 or g in self.keys.galois, f"missing key g={g}"
        pstack = jnp.stack([p.data[..., :l, :] for p in pts])
        ksks = [
            self.keys.galois[g] if g != 1 else self.keys.relin for g in gs
        ]
        if self._ntt_override is not None:
            data = self._rma_impl(ct.data, pstack, ksks, l=l, gs=gs)
        else:
            key = ("rma", l, gs)
            if key not in self._ks_jit:
                self._ks_jit[key] = self._kernel_jit(
                    self._rma_impl, l=l, gs=gs
                )
            data = self._ks_jit[key](self._kstate(), ct.data, pstack, ksks)
        qd = self.params.moduli[l - 1]
        return Ciphertext(
            data=data, scale=ct.scale * s0 / qd, ntt=True
        )

    def _rma_impl(self, data, pstack, ksks, l: int, gs: tuple[int, ...]):
        q, qi, _ = self._ql(l)
        b, a = data[..., 0, :, :], data[..., 1, :, :]
        need_ks = any(g != 1 for g in gs)
        ext = self._decompose_ext(a, l) if need_ks else None
        acc = None
        for gi, g in enumerate(gs):
            if g == 1:
                d01 = data
            else:
                perm = self._galois_perm(g)
                pe = jnp.take(ext, perm, axis=-1)
                ks0, ks1 = self._ks_inner(pe, ksks[gi], l)
                self.stats["keyswitch"] += 1
                d01 = jnp.stack(
                    [add_mod(jnp.take(b, perm, axis=-1), ks0, q), ks1],
                    axis=-3,
                )
            t = mont_mul(d01, pstack[gi], q, qi)
            acc = t if acc is None else add_mod(acc, t, q)
            if ext is not None:
                # The per-rotation inner products are data-independent, so
                # XLA's scheduler freely interleaves them — at bootstrap-DFT
                # widths (l+K=132 rows, 16 diagonals/stage, stacked hi/lo)
                # that's ~400 MB of transients PER ROTATION live at once,
                # which RESOURCE_EXHAUSTED the 16 GB chip (round-4 enc10
                # autopsy: OOM inside the first C2S stage).  Gating the
                # shared decomposition on the accumulator serializes the
                # rotations; each keyswitch saturates the VPU by itself, so
                # the lost overlap is noise.
                ext, acc = jax.lax.optimization_barrier((ext, acc))
        return self._rescale_impl(acc, d=l - 1)

    def conjugate(self, ct: Ciphertext) -> Ciphertext:
        return self.apply_galois(ct, self.params.two_n - 1)

    def apply_galois(self, ct: Ciphertext, g: int) -> Ciphertext:
        g = int(g) % self.params.two_n
        if g == 1:
            return ct
        assert ct.n_poly == 2, "apply_galois needs a relinearized ciphertext"
        assert g in self.keys.galois, f"missing Galois key for g={g}"
        l = ct.n_limbs
        perm = self._galois_perm(g)
        pb = jnp.take(ct.data[..., 0, :, :], perm, axis=-1)
        pa = jnp.take(ct.data[..., 1, :, :], perm, axis=-1)
        ks0, ks1 = self._keyswitch(pa, self.keys.galois[g], l)
        q, _, _ = self._ql(l)
        return ct.with_data(
            jnp.stack([add_mod(pb, ks0, q), ks1], axis=-3)
        )


# ---------------------------------------------------------------------------
# jitted device helpers (module-level so their caches persist)
# ---------------------------------------------------------------------------


@jax.jit
def ntt_jit_rows(x, tables):
    return ntt(x, tables)


@functools.partial(jax.jit, static_argnames=("is_ntt",))
def _decrypt_device(data, s_mont, tables, is_ntt):
    """m = c0 + c1*s (+ c2*s^2), returned in coefficient domain."""
    q = tables.q[:, None]
    qi = tables.q_neg_inv[:, None]
    if not is_ntt:
        data = ntt(data, tables)
    acc = data[..., 0, :, :]
    s_pow = s_mont
    for i in range(1, data.shape[-3]):
        acc = add_mod(acc, mont_mul(data[..., i, :, :], s_pow, q, qi), q)
        if i + 1 < data.shape[-3]:
            # (s^k * R) x (s * R) REDC -> s^{k+1} * R: stays Montgomery.
            s_pow = mont_mul(s_pow, s_mont, q, qi)
    return intt(acc, tables)
