"""Benchmark: homomorphic AES-128 on the real TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

Headline (default): seconds per full homomorphic AES-128 round
(SubBytes -> ShiftRows -> MixColumns -> AddRoundKey on a packed ciphertext
pair), the BASELINE.json metric.  Reference: ~810 s/round on its CPU engine
(README.md:117).  ``vs_baseline`` is the speedup factor
(reference_seconds / ours; > 1 means faster than the reference).

Modes:  python bench.py [round|invround|enc10|dec10|ark|...] [logn]
  round    : full forward round, default logn=15 (1024 AES blocks/ct pair)
  invround : full inverse round (ISR -> ISB -> ARK -> InvMixColumns, the
             order the reference's committed decrypt DROPPED — SURVEY.md Q1);
             reference decryption: ~1394 s/round CPU (README.md:118)
  enc10    : COMPLETE 10-round AES-128 encryption, bootstrap-stabilized (no
             secret key anywhere in the hot path — the reference used
             hard renorm); reference: 8,208 s CPU (README.md:117).  Set
             AES_FHE_SAVE_CT=<path> to hand the output pair to dec10.
  dec10    : COMPLETE 10-round decryption (correct inverse order, fixing
             reference quirk Q1) of an enc10-saved pair + exact roundtrip
             recovery; reference: 13,938 s CPU (README.md:118).  enc10 +
             dec10 together are the reference's 22,146 s roundtrip — run
             as two processes because the TPU tunnel leaks HBM across
             program executions (DESIGN.md §17).
  enc10seg : enc10 as SIX sequential ≤2-round processes with the ciphertext
             pair checkpointed to disk between them — stays under the
             tunnel's ~7-refresh silent-corruption cliff (DESIGN.md §18) so
             the full 10-round encryption verifies bit-exact on the chip.
  dec10seg : dec10 segmented the same way (inverse rounds count down); the
             final segment checks exact recovery of the original plaintext.
  ark      : AddRoundKey only (reference's 1.63 s microbenchmark, main.py:144)
  boot     : ONE stacked-pair refresh (bootstrap + snap) at the enc10 chain —
             wall + max slot error; the standalone regression metric for the
             op that dominates enc10/dec10 (20-30 refreshes per pass)

All vs_baseline factors are PER-BLOCK normalized (the reference packs 2048
blocks/ct pair at N=2^16; the default bench ring is N=2^15 = 1024 blocks).
"""

from __future__ import annotations

import json
import signal
import sys
import time

import numpy as np
import jax

# Persistent compile cache *inside the repo* so it survives across driver
# rounds (the remote TPU compiler here takes ~0.7 s per tiny program and
# minutes for large ones; warmup dominated early benches).
import os as _os

_CACHE = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_cache")


def _seed_jax_cache() -> None:
    """Populate .jax_cache from the COMMITTED .jax_cache_seed subset.

    .jax_cache itself is gitignored (2.9 GB, every chain ever compiled);
    the seed dir holds just the TPU executables the driver's default
    `python bench.py` round needs (captured by atime on a cold-equivalent
    run).  A fresh clone therefore warms up by *loading* programs instead
    of recompiling them — the round-4 driver bench lost its headline to
    exactly that recompile (BENCH_r04: watchdog in warmup).  Hardlink when
    possible (same fs), copy otherwise; never overwrite newer entries."""
    seed = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                         ".jax_cache_seed")
    if not _os.path.isdir(seed):
        return
    _os.makedirs(_CACHE, exist_ok=True)
    import shutil

    n = 0
    for name in _os.listdir(seed):
        dst = _os.path.join(_CACHE, name)
        if _os.path.exists(dst):
            continue
        src = _os.path.join(seed, name)
        try:
            _os.link(src, dst)
        except OSError:
            shutil.copy2(src, dst)
        n += 1
    if n:
        print(f"seeded .jax_cache with {n} committed entries", file=sys.stderr)


_seed_jax_cache()
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
# jax.export program cache: skips Python tracing + StableHLO lowering for
# the big whole-op programs on cold processes (~100 s/program at N=2^15,
# the round-2 driver-budget killer — DESIGN.md §13 lever #1).
_os.environ.setdefault(
    "AES_FHE_EXPORT_CACHE_DIR",
    _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".jax_export_cache"),
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# The reference's published numbers are for N=2^16 = 2048 AES blocks per
# ciphertext pair (main.py:121-136); this bench's default ring is N=2^15 =
# 1024 blocks.  All ``vs_baseline`` factors are therefore PER-BLOCK
# normalized (round-3 verdict weak item #3): speedup =
# (ref_sec / REF_BLOCKS) / (our_sec / our_blocks).  Raw wall-clock ratios
# would overstate the win by our_blocks/REF_BLOCKS.
REF_BLOCKS = 2048


def per_block(result: dict, ref_sec: float, our_blocks: int) -> dict:
    """Fill in per-block-normalized comparison fields for a timing result."""
    t = result["value"]
    result["blocks_per_ct"] = our_blocks
    result["blocks_per_sec"] = round(our_blocks / t, 2)
    result["ref_sec"] = ref_sec
    result["ref_blocks"] = REF_BLOCKS
    result["vs_baseline_wallclock"] = round(ref_sec / t, 1)
    result["vs_baseline"] = round(
        (ref_sec / REF_BLOCKS) / (t / our_blocks), 1
    )
    return result


# ---------------------------------------------------------------------------
# Watchdog: the round-1 driver run died rc=124 with NO json (keygen + cold
# compiles overran the external timeout).  Now the bench *always* prints a
# JSON line: a progress dict is updated as phases complete, and a SIGALRM
# fires at AES_FHE_BENCH_BUDGET seconds (default 480) printing the best
# available partial result before the external timeout can kill us.
# ---------------------------------------------------------------------------
PROGRESS: dict = {"metric": "aes128_round_sec", "value": None, "unit": "s",
                  "vs_baseline": None, "partial": True, "phase": "startup"}
_T_START = time.time()


def note(**kw):
    PROGRESS.update(kw)
    PROGRESS["elapsed_sec"] = round(time.time() - _T_START, 1)


def _emit_partial():
    if _RESULT_EMITTED:
        return
    log(f"WATCHDOG: budget hit in phase {PROGRESS.get('phase')!r}; "
        "emitting partial result")
    if PROGRESS.get("value") is None:
        # no steady-state measurement yet: report the phase we died in with
        # the elapsed wall time so the driver records *something* attributable
        PROGRESS["value"] = round(time.time() - _T_START, 1)
        PROGRESS["timed_out_in"] = PROGRESS.get("phase")
    print(json.dumps(PROGRESS), flush=True)
    _os._exit(0)


def _alarm(_sig, _frm):
    _emit_partial()


_WATCHDOG_TIMER = None
_RESULT_EMITTED = False


def arm_watchdog():
    global _WATCHDOG_TIMER
    budget = int(_os.environ.get("AES_FHE_BENCH_BUDGET", "480"))
    if budget > 0:
        signal.signal(signal.SIGALRM, _alarm)
        signal.alarm(budget)
        # SIGALRM only runs between Python bytecodes of the main thread; a
        # multi-minute remote-compile RPC blocks it past the external
        # timeout (round-2 finding: the 29-bit warmup died rc=124 with no
        # JSON).  A daemon timer thread fires regardless, as long as the
        # RPC releases the GIL (it does — it's IO).
        import threading

        t = threading.Timer(budget + 5.0, _emit_partial)
        t.daemon = True
        t.start()
        _WATCHDOG_TIMER = t


def disarm_watchdog():
    """Cancel BOTH watchdogs once the real result is ready (a surviving
    daemon timer could otherwise fire while the final JSON prints and
    os._exit mid-line — round-2 advisor finding)."""
    global _RESULT_EMITTED
    _RESULT_EMITTED = True
    signal.alarm(0)
    if _WATCHDOG_TIMER is not None:
        _WATCHDOG_TIMER.cancel()


def fetch_sync(*arrays):
    """Force completion AND observe it: on the axon TPU tunnel
    ``block_until_ready`` can return before the computation finishes (round-2
    finding: a full AES round 'measured' 0.02 s that way), so every timing
    loop must fetch a dependent value.  A [1,1] slice makes the fetch itself
    ~4 bytes + one ~28 ms RTT — negligible against multi-second kernels."""
    for a in arrays:
        jax.device_get(a[(0,) * (a.ndim - 2) + (slice(0, 1), slice(0, 1))])


def build(
    logn: int,
    n_level_primes: int,
    secret_hamming: int | None = None,
    scale_bits: int = 58,
):
    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext
    from aes_fhe_tpu.aes.state import StateEncoder
    from aes_fhe_tpu.aes.ops import rotation_steps_required

    t0 = time.time()
    params = make_params(
        logn=logn,
        n_level_primes=n_level_primes,
        dnum=3,
        scale_bits=scale_bits,
    )
    stride = params.n_slots // 16
    rotations = tuple(rotation_steps_required(stride))

    # Warm-start key cache: keygen cost the driver bench ~45-60 s of its
    # 480 s budget (BENCH_r02).  Keys are deterministic in (params, seed,
    # rotations, hamming), so persist the set once and install it on later
    # runs (utils/serialization.py; seed-compressed, uncompressed npz).
    kc_dir = _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".keycache")
    kc_tag = (
        f"l{logn}_p{n_level_primes}_s{scale_bits}"
        f"_h{secret_hamming or 0}_r{hash(rotations) & 0xFFFFFFFF:08x}_seed7"
    )
    kc_path = _os.path.join(kc_dir, kc_tag + ".npz")
    use_kc = _os.environ.get("AES_FHE_KEY_CACHE", "1") != "0"
    if use_kc and _os.path.exists(kc_path):
        from aes_fhe_tpu.utils.serialization import load_keyset

        ctx = CkksContext(
            params,
            seed=7,
            rotations=rotations,
            secret_hamming=secret_hamming,
            keygen=False,
        )
        ctx.install_keys(load_keyset(kc_path))
        log(f"keys: loaded cached set ({kc_tag})")
    else:
        ctx = CkksContext(
            params,
            seed=7,
            rotations=rotations,
            secret_hamming=secret_hamming,
        )
        if use_kc:
            from aes_fhe_tpu.utils.serialization import save_keyset

            _os.makedirs(kc_dir, exist_ok=True)

            # Save ASYNCHRONOUSLY: fetching ~450 MB of key material back
            # through the device tunnel took 153 s measured — overlapped
            # with warmup compiles it costs nothing.  Write to a temp file
            # and atomically rename so a killed run never leaves a partial
            # cache.
            def _save():
                t_s = time.time()
                tmp = kc_path + f".tmp{_os.getpid()}"
                try:
                    save_keyset(tmp, ctx.keys, compress=False)
                    _os.replace(tmp + ".npz" if not tmp.endswith(".npz")
                                else tmp, kc_path)
                    log(f"keys: saved cache ({time.time()-t_s:.1f}s, "
                        f"{kc_tag})")
                except Exception as e:  # never let the saver kill the bench
                    log(f"keys: cache save failed ({type(e).__name__}: {e})")

            import threading

            global _SAVE_THREAD
            _SAVE_THREAD = threading.Thread(target=_save, daemon=True)
            _SAVE_THREAD.start()
    enc = StateEncoder(ctx)
    global _LAST_KC
    _LAST_KC = kc_path if use_kc else None
    log(
        f"context+keygen: {time.time()-t0:.1f}s  (N=2^{logn}, "
        f"L={params.n_limbs}, K={params.n_special}, batch={enc.batch})"
    )
    note(phase="warmup", keygen_sec=round(time.time() - t0, 1))
    return ctx, enc


_LAST_KC: str | None = None
_SAVE_THREAD = None


def resave_keys(ctx) -> None:
    """Refresh the key cache after late key additions (the bootstrapper's
    ~80 DFT Galois keys), so warm runs skip that keygen too."""
    if _LAST_KC is None:
        return
    if _SAVE_THREAD is not None:
        _SAVE_THREAD.join()  # don't let the base-set saver clobber ours
    from aes_fhe_tpu.utils.serialization import save_keyset

    n_now = len(ctx.keys.galois)
    import numpy as _np

    if _os.path.exists(_LAST_KC):
        with _np.load(_LAST_KC, allow_pickle=False) as z:
            n_saved = sum(1 for f in z.files if f.endswith("_b")) - 1
    else:  # cold run: the async saver may still be fetching
        n_saved = -1
    if n_now > n_saved:
        t0 = time.time()
        tmp = _LAST_KC + f".tmp{_os.getpid()}r"
        save_keyset(tmp, ctx.keys, compress=False)
        _os.replace(tmp + ".npz", _LAST_KC)
        log(f"keys: re-saved cache with {n_now} Galois keys "
            f"({time.time()-t0:.1f}s)")


def bench_ark(logn: int):
    from __graft_entry__ import _ark_step_fn
    from aes_fhe_tpu.ckks.types import Ciphertext

    ctx, enc = build(logn, 14)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    keys = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(states)
    kt = enc.encrypt(keys)
    step = _ark_step_fn(ctx, ct[0])
    args = (ct[0].data, ct[1].data, kt[0].data, kt[1].data)

    t0 = time.time()
    out = step(*args)
    fetch_sync(*out)
    log(f"warmup (compiles): {time.time()-t0:.1f}s")

    times = []
    for _ in range(5):
        t0 = time.time()
        out = step(*args)
        fetch_sync(*out)
        times.append(time.time() - t0)
    t_med = float(np.median(times))
    log(f"times: {['%.3f' % t for t in times]}")

    hi = Ciphertext(data=out[0], scale=ct[0].scale, ntt=True)
    lo = Ciphertext(data=out[1], scale=ct[0].scale, ntt=True)
    got = enc.decrypt(hi, lo, n_blocks=4)
    ok = bool(np.array_equal(got, states[:4] ^ keys[:4]))
    log(f"correctness (4 blocks): {ok}")
    return per_block(
        {
            "metric": "aes128_addroundkey_sec",
            "value": t_med,
            "unit": "s",
            "correct": ok,
        },
        ref_sec=1.63,
        our_blocks=enc.batch,
    )


def bench_round(logn: int, inverse: bool = False, scale_bits: int = 58):
    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
    from aes_fhe_tpu.aes import reference as R

    # Default: the Δ=2^58 chain — measured COMPLETE on the TPU (round 2):
    # 2.43 s/round bit-exact, 333x vs the reference's 810 s/round, under
    # fetch-forced timing.  The Δ=2^29 depth-diet chain (``round29``)
    # consumes 35 limbs/round instead of 63 (bit-exact on CPU) and is the
    # designated next default once its TPU warmup compiles land.  NOTE:
    # logQP at these settings exceeds the 128-bit-security bound for this
    # N — acceptable for a performance benchmark; production parameters
    # use N=2^16 with bootstrapping.
    n_level = 68 if scale_bits == 58 else 52
    ctx, enc = build(logn, n_level, scale_bits=scale_bits)
    if _os.environ.get("AES_FHE_MAT_KEYS", "1") != "0":
        t0 = time.time()
        nb = ctx.materialize_key_a()
        log(f"materialized key a-parts: {nb/1e6:.0f} MB in {time.time()-t0:.1f}s")
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    key = np.arange(16, dtype=np.uint8)
    rks = R.expand_aes128_key(key)

    def make_round(use_jit: bool):
        pipe = AES128(ctx, policy=SnapPolicy.NONE, use_jit=use_jit)
        rk = pipe.prepare_round_keys(rks)

        def fwd_round(ct):
            ct = pipe.sub(*ct)
            ct = pipe.shift(ct)
            ct = pipe.mix(ct)
            return pipe.ark(ct, rk[1])

        def inv_round(ct):
            # the decryption round the reference's committed pipeline
            # dropped (SURVEY.md Q1): ISR -> ISB -> ARK -> InvMixColumns
            ct = pipe.inv_shift(ct)
            ct = pipe.inv_sub(*ct)
            ct = pipe.ark(ct, rk[9])
            return pipe.inv_mix(ct)

        return pipe, (inv_round if inverse else fwd_round)

    # Per-op jit is the proven fast path (15.3 s/round vs 64.7 s eager with
    # hi/lo batching; compiles are one-time and land in .jax_cache).  Set
    # AES_FHE_BENCH_JIT=0 to fall back to eager glue + per-kernel jits.
    import os

    want_jit = os.environ.get("AES_FHE_BENCH_JIT", "1") != "0"
    ct0 = enc.encrypt(states)
    t0 = time.time()
    exec_path = "jit" if want_jit else "eager"
    try:
        pipe, one_round = make_round(use_jit=want_jit)
        out = one_round(ct0)
        fetch_sync(out[0].data, out[1].data)
    except Exception as e:  # remote compiler may kill very large programs
        log(f"jitted-op round failed ({type(e).__name__}); eager fallback")
        exec_path = "eager-fallback"
        pipe, one_round = make_round(use_jit=False)
        out = one_round(ct0)
        fetch_sync(out[0].data, out[1].data)
    warm = time.time() - t0
    log(f"warmup round (incl compiles): {warm:.1f}s")
    # provisional result: if the watchdog fires during the steady runs, the
    # warmup-round time is still an honest (pessimistic) round time
    metric = "aes128_inv_round_sec" if inverse else "aes128_round_sec"
    ref_sec0 = 13938.0 / 10 if inverse else 810.0
    # A COMPLETED warmup round is a real measured round time (pessimistic:
    # it includes compiles/loads, and says so) — if the watchdog fires
    # during the steady re-runs, the emitted result is no longer partial
    # (round-4 verdict item 3: the driver lost the headline to a warmup
    # timeout and recorded only a placeholder).
    note(phase="steady", metric=metric, value=round(warm, 2),
         vs_baseline=round((ref_sec0 / REF_BLOCKS) / (warm / enc.batch), 1),
         warmup_sec=round(warm, 1), partial=False,
         exec_path=exec_path, includes_compile=True)

    times = []
    for _ in range(2):
        t0 = time.time()
        out = one_round(ct0)
        fetch_sync(out[0].data, out[1].data)
        times.append(time.time() - t0)
    t_med = float(np.median(times))
    log(f"round times: {['%.2f' % t for t in times]}")

    got = pipe.decode(out, n_blocks=4)
    if inverse:
        want = np.stack(
            [
                R.inv_mix_columns(
                    R.add_round_key(
                        R.inv_sub_bytes(R.inv_shift_rows(s)), rks[9]
                    )
                )
                for s in states[:4]
            ]
        )
        ref_sec = 13938.0 / 10  # reference decryption, README.md:118
        metric = "aes128_inv_round_sec"
    else:
        want = np.stack(
            [
                R.add_round_key(
                    R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[1]
                )
                for s in states[:4]
            ]
        )
        ref_sec = 810.0
        metric = "aes128_round_sec"
    ok = bool(np.array_equal(got, want))
    log(f"round correctness (4 blocks): {ok}")
    return per_block(
        {
            "metric": metric,
            "value": t_med,
            "unit": "s",
            "correct": ok,
            "exec_path": exec_path,
            "keys": "materialized-a"
            if _os.environ.get("AES_FHE_MAT_KEYS", "1") != "0"
            else "seed-compressed",
            "warmup_sec": round(warm, 1),
        },
        ref_sec=ref_sec,
        our_blocks=enc.batch,
    )


def bench_enc10(logn: int, scale_bits: int = 58):
    """Complete 10-round homomorphic AES-128 encryption under the BOOTSTRAP
    snap policy — the capability the reference simulated with secret-key
    hard renorm (SURVEY.md Q4).  3 stacked hi/lo bootstraps per round."""
    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
    from aes_fhe_tpu.aes import reference as R

    # bootstrap budget: at logn=15 each DFT direction has 5 merged stages
    # (vs 2-3 at unit-test ring sizes), so the refresh must start from
    # enough level primes to land snap (~12) + deepest op (SubBytes) after
    # the interior's consumption.  Sparse secret keeps EvalMod's range
    # small.  On the Δ=2^29 depth-diet chain (``enc1029``) the bootstrap
    # interior runs at Δ²=2^58 (round-3 fix, DESIGN.md §14: interior
    # consumption is the same BITS as the deep chain, the AES rounds
    # outside run at 35 limbs instead of 63); 80 single-width primes cover
    # interior (~50) + snap + SubBytes.
    # 100 primes (was 96 pre-K-fix, then wrongly 98): the round-4 EvalMod
    # range fix (bootstrap.py — the corruption "cliff" was ONE lifted
    # coefficient exceeding the old N-independent 4.5-sigma bound per
    # 10-round run) widened K 32 -> 64 at N=2^15, deepening the interior
    # by MORE than the naive one-squaring estimate: the static probe
    # (tools/probe_limbs.py, round-5) measures the refresh landing at
    # 98 -> 27 limbs (round-1 SubBytes trace crash), 100 -> 34 (the level
    # the AES round ops were budgeted for: sub 26 / mix 27 / ark 9),
    # 102 -> 38 (enough to merge the mix+ark stabilizes, see AES128
    # merge_mix_ark).
    n_level = (
        int(_os.environ.get("AES_FHE_ENC10_LEVELS", "0"))
        or (100 if scale_bits == 58 else 82)
    )
    ctx, enc = build(
        logn, n_level, secret_hamming=192, scale_bits=scale_bits
    )
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    key = np.arange(16, dtype=np.uint8)
    rks = R.expand_aes128_key(key)

    want_jit = _os.environ.get("AES_FHE_BENCH_JIT", "1") != "0"
    # AES_FHE_ENTRY_LIMBS=34 enters round 0 at the refresh output level so
    # every round shares one program-signature set (AES128.entry_limbs).
    # DEFAULT OFF: with it on, the 2-round pipeline at N=2^15 decoded the
    # final-round AddRoundKey catastrophically wrong (round-4 stage
    # differential) while the identical pipeline without it was exact to
    # 2/16384 bytes — root cause still open, do not enable for measured
    # runs until it is.
    entry = int(_os.environ.get("AES_FHE_ENTRY_LIMBS", "0")) or None
    # AES_FHE_MERGED_STAB=1: the two-stabilize round schedule (20 refreshes
    # per 10-round pass instead of 30).  Needs a chain whose refresh lands
    # >=42 limbs — probe-verified: 106 levels land at 45 (set
    # AES_FHE_ENC10_LEVELS=106 together with this flag).
    merged = _os.environ.get("AES_FHE_MERGED_STAB", "0") == "1"
    pipe = AES128(
        ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=want_jit,
        entry_limbs=entry, merged_stab=merged,
        snap_count=int(_os.environ.get("AES_FHE_SNAP_COUNT", "1")),
        mag_damp=_os.environ.get("AES_FHE_MAG_DAMP", "0") == "1",
    )
    resave_keys(ctx)  # persist the bootstrap DFT keys for warm runs
    n_rounds = int(_os.environ.get("AES_FHE_ENC_ROUNDS", "10"))

    # Segment-worker mode (driven by the ``enc10seg`` orchestrator):
    # AES_FHE_SEGMENT="s:e" runs rounds [s, e) of the encryption in THIS
    # process, resuming/checkpointing the ciphertext pair through
    # AES_FHE_SEGMENT_CKPT.  An empty "e" means run to completion
    # (including the final round) and verify.  Rationale: the TPU tunnel
    # silently corrupts a refresh after ~6 refreshes interleaved with the
    # big AES op programs in one process (DESIGN.md §18's cliff); ≤2
    # rounds (≤6 refreshes) per process stays under it.
    seg = _os.environ.get("AES_FHE_SEGMENT")
    seg_stop = None
    seg_kwargs: dict = {}
    if seg:
        s_start_s, s_stop_s = seg.split(":")
        s_start = int(s_start_s)
        seg_stop = int(s_stop_s) if s_stop_s else None
        ckpt = _os.environ.get("AES_FHE_SEGMENT_CKPT", "/tmp/enc10_seg")
        if s_start > 0:
            from aes_fhe_tpu.utils.serialization import load_ciphertext

            seg_kwargs["resume_ct"] = (
                load_ciphertext(ckpt + ".hi.npz"),
                load_ciphertext(ckpt + ".lo.npz"),
            )
            seg_kwargs["start_round"] = s_start
            log(f"segment {seg}: resumed ciphertext pair from {ckpt}")
        if seg_stop is not None:
            seg_kwargs["stop_round"] = seg_stop

    t0 = time.time()
    ct = pipe.encrypt_states(states, rks, n_rounds=n_rounds, **seg_kwargs)
    fetch_sync(ct[0].data, ct[1].data)
    t_run = time.time() - t0
    log(f"{n_rounds}-round encrypt pass: {t_run:.1f}s "
        f"(bootstraps: {ctx.stats['bootstrap']})")
    note(phase="verify", value=round(t_run, 2),
         vs_baseline=round((8208.0 / REF_BLOCKS) / (t_run / enc.batch), 1),
         includes_compile=True)

    if seg and seg_stop is not None:  # mid segment: checkpoint + report
        from aes_fhe_tpu.utils.serialization import save_ciphertext

        ckpt = _os.environ.get("AES_FHE_SEGMENT_CKPT", "/tmp/enc10_seg")
        save_ciphertext(ckpt + ".hi", ct[0])
        save_ciphertext(ckpt + ".lo", ct[1])
        log(f"segment {seg}: checkpointed ciphertext pair to {ckpt}")
        return per_block(
            {
                "metric": "aes128_encrypt10_sec",
                "value": t_run,
                "unit": "s",
                "segment": seg,
                "correct": None,
                "exec_path": "jit" if want_jit else "eager",
                "bootstraps": ctx.stats["bootstrap"],
                "includes_program_loads": True,
            },
            ref_sec=8208.0,
            our_blocks=enc.batch,
        )

    # A second in-process pass would normally give the clean steady number,
    # but this environment's TPU tunnel LEAKS HBM across program executions
    # (round-4 measurement: client-side live arrays were 5.79 GiB after a
    # full pass, yet the very first re-dispatched program hit
    # RESOURCE_EXHAUSTED on the ~15 GiB chip) — so the default is ONE
    # measured pass.  With the repo's disk caches warm that pass IS steady
    # execution: every program deserializes from the XLA cache (no tracing,
    # no compiles); only the first-dispatch program loads (~tens of
    # seconds) are extra, and they are reported, not hidden.
    if _os.environ.get("AES_FHE_ENC10_TWO_PASS", "0") == "1":
        import gc

        del ct
        gc.collect()
        live = sum(a.nbytes for a in jax.live_arrays())
        log(f"live device arrays before steady pass: {live/2**30:.2f} GiB")
        t0 = time.time()
        ct = pipe.encrypt_states(states, rks)
        fetch_sync(ct[0].data, ct[1].data)
        t_run = time.time() - t0
        log(f"steady 10-round encrypt: {t_run:.1f}s")

    got = pipe.decode(ct)  # ALL blocks: marginal-noise bytes must show

    def want_state(s):
        s = R.add_round_key(s, rks[0])
        for r in range(1, n_rounds):
            s = R.add_round_key(
                R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[r]
            )
        return R.add_round_key(R.shift_rows(R.sub_bytes(s)), rks[n_rounds])

    want = np.stack([want_state(s.copy()) for s in states])
    ok = bool(np.array_equal(got, want))
    mism = int((got != want).sum())
    log(f"{n_rounds}-round correctness (ALL {enc.batch} blocks): {ok} "
        f"(mismatched bytes: {mism}/{got.size})")
    if mism:
        log(f"  got[0] : {got[0].tolist()}")
        log(f"  want[0]: {want[0].tolist()}")

    # Hand-off for the dec10 half of the roundtrip (run as a SEPARATE
    # process: the tunnel's cross-execution HBM leak rules out ~70
    # refreshes in one process — see the two-pass comment above).
    save_ct = _os.environ.get("AES_FHE_SAVE_CT")
    if save_ct:
        from aes_fhe_tpu.utils.serialization import save_ciphertext

        save_ciphertext(save_ct + ".hi", ct[0])
        save_ciphertext(save_ct + ".lo", ct[1])
        log(f"saved encrypted state pair to {save_ct}.{{hi,lo}}.npz")

    return per_block(
        {
            "metric": "aes128_encrypt10_sec",
            "value": t_run,
            "unit": "s",
            "correct": ok,
            "exec_path": "jit" if want_jit else "eager",
            "bootstraps": ctx.stats["bootstrap"],
            "single_pass": _os.environ.get("AES_FHE_ENC10_TWO_PASS", "0")
            != "1",
            "includes_program_loads": True,
        },
        ref_sec=8208.0,
        our_blocks=enc.batch,
    )


def _orchestrate_segments(
    worker_mode: str,
    logn: int,
    segs: list,
    metric: str,
    ref_sec: float,
    ckpt_default: str,
):
    """Run one logical 10-round pipeline as SIX sequential processes of
    ≤2 AES rounds (≤6 refreshes) each, with the ciphertext pair
    checkpointed to disk between them — staying under the tunnel's
    silent-corruption cliff (one refresh goes wrong after ~7 refreshes
    interleave with the big AES op programs in a single process; the
    same refresh program is exact 12/12 times in isolation —
    DESIGN.md §18).  ``value`` is the sum of the per-segment times (each
    including that segment's program loads, as enc10/dec10 report them);
    context builds/key loads are excluded exactly as the single-process
    modes exclude them, and the full orchestration wall (everything, 6×)
    is reported alongside."""
    import subprocess

    ckpt = _os.environ.get("AES_FHE_SEGMENT_CKPT", ckpt_default)
    # Budget PER SEGMENT.  The first segment of a cold container carries
    # nearly the whole compile load (keygen + bootstrap DFT keygen + every
    # program signature of rounds 0..9) — give it room; warm segments take
    # minutes.  A segment that overruns is reported as the failed segment
    # instead of crashing the orchestrator.
    seg_budget = int(_os.environ.get("AES_FHE_SEG_BUDGET", "4200"))
    seg_times: list[float] = []
    boots = 0
    template: dict = {}
    t_wall0 = time.time()
    for s, e in segs:
        env = dict(_os.environ)
        env["AES_FHE_SEGMENT"] = f"{s}:{'' if e is None else e}"
        env["AES_FHE_SEGMENT_CKPT"] = ckpt
        env["AES_FHE_BENCH_BUDGET"] = "0"  # orchestrator owns the budget
        note(phase=f"segment {s}:{e}")
        log(f"=== {worker_mode} segment rounds "
            f"[{s}, {e if e is not None else 'final'}] ===")
        try:
            p = subprocess.run(
                [sys.executable, _os.path.abspath(__file__),
                 worker_mode, str(logn)],
                env=env, capture_output=True, text=True, timeout=seg_budget,
            )
        except subprocess.TimeoutExpired as te:
            for line in (te.stderr or b"").decode(errors="replace") \
                    .splitlines():
                log(f"  [seg {s}] {line}")
            log(f"segment {s}:{e} TIMED OUT after {seg_budget}s")
            return {
                "metric": metric,
                "value": round(sum(seg_times), 2),
                "unit": "s",
                "correct": False,
                "partial": True,
                "failed_segment": f"{s}:{e}",
                "timeout_sec": seg_budget,
                "segment_sec": seg_times,
            }
        for line in p.stderr.splitlines():
            log(f"  [seg {s}] {line}")
        if p.returncode != 0 or not p.stdout.strip():
            log(f"segment {s}:{e} FAILED rc={p.returncode}")
            return {
                "metric": metric,
                "value": round(sum(seg_times), 2),
                "unit": "s",
                "correct": False,
                "partial": True,
                "failed_segment": f"{s}:{e}",
                "segment_sec": seg_times,
            }
        template = json.loads(p.stdout.strip().splitlines()[-1])
        seg_times.append(round(template["value"], 2))
        boots += int(template.get("bootstraps", 0) or 0)
        note(value=round(sum(seg_times), 2), segments_done=len(seg_times))
    return per_block(
        {
            "metric": metric,
            "value": round(sum(seg_times), 2),
            "unit": "s",
            "correct": template.get("correct"),
            "exec_path": template.get("exec_path"),
            "bootstraps": boots,
            "segmented": len(segs),
            "segment_sec": seg_times,
            "single_pass": True,
            "includes_program_loads": True,
            "orchestration_wall_sec": round(time.time() - t_wall0, 1),
        },
        ref_sec=ref_sec,
        our_blocks=int(template.get("blocks_per_ct", 2 ** (logn - 5))),
    )


def bench_enc10_segmented(logn: int):
    """Verified-correct 10-round ENCRYPTION via pipeline segmentation.
    Reference: 8,208 s for the same complete 10-round encryption
    (/root/reference/README.md:117)."""
    return _orchestrate_segments(
        "enc10", logn,
        [(0, 2), (2, 4), (4, 6), (6, 8), (8, 10), (10, None)],
        "aes128_encrypt10_sec", 8208.0, "/tmp/enc10_seg",
    )


def bench_dec10_segmented(logn: int):
    """Verified-roundtrip 10-round DECRYPTION via pipeline segmentation
    (inverse rounds count DOWN; the final segment checks exact recovery
    of the original plaintext blocks against the enc10-saved pair).
    Reference: 13,938 s CPU decryption (/root/reference/README.md:118)."""
    return _orchestrate_segments(
        "dec10", logn,
        [(9, 9), (8, 7), (6, 5), (4, 3), (2, 1), (0, None)],
        "aes128_decrypt10_sec", 13938.0, "/tmp/dec10_seg",
    )


def bench_dec10(logn: int):
    """Complete 10-round homomorphic AES-128 DECRYPTION in the correct
    inverse order (ISR -> ISB -> ARK -> InvMixColumns — fixing reference
    quirk Q1), bootstrap-stabilized.  Reference: 13,938 s CPU
    (README.md:118).

    Input: the ciphertext pair a previous ``enc10`` run saved via
    AES_FHE_SAVE_CT (same params/seed, so the persisted keyset matches).
    Exact roundtrip recovery of the original plaintext blocks is checked,
    closing the encrypt->decrypt loop across the two processes."""
    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
    from aes_fhe_tpu.aes import reference as R
    from aes_fhe_tpu.utils.serialization import load_ciphertext

    ct_path = _os.environ.get("AES_FHE_LOAD_CT", "/tmp/enc10_ct")
    # MUST match bench_enc10's chain (the saved pair's limb ladder and the
    # persisted keyset are both params-keyed) — see the comment there.
    n_level = int(_os.environ.get("AES_FHE_ENC10_LEVELS", "0")) or 100
    ctx, enc = build(logn, n_level, secret_hamming=192)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    key = np.arange(16, dtype=np.uint8)
    rks = R.expand_aes128_key(key)

    ct = (
        load_ciphertext(ct_path + ".hi.npz"),
        load_ciphertext(ct_path + ".lo.npz"),
    )
    log(f"loaded encrypted state pair from {ct_path}.{{hi,lo}}.npz "
        f"(l={ct[0].n_limbs})")

    want_jit = _os.environ.get("AES_FHE_BENCH_JIT", "1") != "0"
    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=want_jit,
                  merged_stab=_os.environ.get("AES_FHE_MERGED_STAB", "0") == "1",
                  snap_count=int(_os.environ.get("AES_FHE_SNAP_COUNT", "1")),
                  mag_damp=_os.environ.get("AES_FHE_MAG_DAMP", "0") == "1")
    resave_keys(ctx)

    # Segment-worker mode (``dec10seg`` orchestrator): inverse rounds
    # count DOWN.  AES_FHE_SEGMENT="s:e" processes inverse rounds s..e
    # descending ("e" empty = through the final round + roundtrip check);
    # the first segment (s == 9) takes the enc10-saved pair as input,
    # later segments resume from the AES_FHE_SEGMENT_CKPT checkpoint.
    seg = _os.environ.get("AES_FHE_SEGMENT")
    seg_stop = None
    seg_kwargs: dict = {}
    if seg:
        s_start_s, s_stop_s = seg.split(":")
        s_start = int(s_start_s)
        seg_stop = int(s_stop_s) if s_stop_s else None
        ckpt = _os.environ.get("AES_FHE_SEGMENT_CKPT", "/tmp/dec10_seg")
        seg_kwargs["start_round"] = s_start
        if s_start < 9:
            seg_kwargs["resume_ct"] = (
                load_ciphertext(ckpt + ".hi.npz"),
                load_ciphertext(ckpt + ".lo.npz"),
            )
            log(f"segment {seg}: resumed ciphertext pair from {ckpt}")
        if seg_stop is not None:
            seg_kwargs["stop_round"] = seg_stop

    t0 = time.time()
    out = pipe.decrypt_states(ct, rks, **seg_kwargs)
    fetch_sync(out[0].data, out[1].data)
    t_run = time.time() - t0
    log(f"10-round decrypt pass: {t_run:.1f}s "
        f"(bootstraps: {ctx.stats['bootstrap']})")

    if seg and seg_stop is not None:  # mid segment: checkpoint + report
        from aes_fhe_tpu.utils.serialization import save_ciphertext

        ckpt = _os.environ.get("AES_FHE_SEGMENT_CKPT", "/tmp/dec10_seg")
        save_ciphertext(ckpt + ".hi", out[0])
        save_ciphertext(ckpt + ".lo", out[1])
        log(f"segment {seg}: checkpointed ciphertext pair to {ckpt}")
        return per_block(
            {
                "metric": "aes128_decrypt10_sec",
                "value": t_run,
                "unit": "s",
                "segment": seg,
                "correct": None,
                "exec_path": "jit" if want_jit else "eager",
                "bootstraps": ctx.stats["bootstrap"],
                "includes_program_loads": True,
            },
            ref_sec=13938.0,
            our_blocks=enc.batch,
        )

    got = pipe.decode(out)  # ALL blocks
    ok = bool(np.array_equal(got, states))
    mism = int((got != states).sum())
    log(f"roundtrip recovery (ALL {enc.batch} blocks): {ok} "
        f"(mismatched bytes: {mism}/{got.size})")
    return per_block(
        {
            "metric": "aes128_decrypt10_sec",
            "value": t_run,
            "unit": "s",
            "correct": ok,
            "exec_path": "jit" if want_jit else "eager",
            "bootstraps": ctx.stats["bootstrap"],
            "single_pass": True,
            "includes_program_loads": True,
        },
        ref_sec=13938.0,
        our_blocks=enc.batch,
    )


def bench_ks(logn: int, n_level: int = 68):
    """Key-switch microbenchmark: one relinearize-grade switch at high limb
    count — the kernel that dominates every AES op (~270 calls/round)."""
    from aes_fhe_tpu.ckks.types import Ciphertext

    ctx, enc = build(logn, n_level)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(states)[0]
    l = ct.n_limbs

    a = ct.data[1]
    CHAIN = 20  # chained switches inside ONE jit: the axon tunnel's
    # dispatch/fetch RTT (~30 ms) would otherwise swamp the kernel time

    def timed(tag):
        def chain(x, ksk):  # key as argument, not a 74 MB XLA constant
            def body(x, _):
                d0, d1 = ctx._keyswitch_impl(x, ksk, l)
                return d0, d1[0, 0]
            return jax.lax.scan(body, x, None, length=CHAIN)[0]

        ksn = jax.jit(chain)
        t0 = time.time()
        jax.device_get(ksn(a, ctx.keys.relin))
        log(f"[{tag}] warmup (compiles): {time.time()-t0:.1f}s")
        times = []
        for _ in range(5):
            t0 = time.time()
            jax.device_get(ksn(a, ctx.keys.relin))
            times.append((time.time() - t0) / CHAIN)
        t_med = float(np.median(times))
        log(f"[{tag}] keyswitch[l={l}]: {['%.4f' % t for t in times]}")
        return t_med

    t_seed = timed("seed-compressed")
    nbytes = ctx.materialize_key_a()
    log(f"materialized a-parts: {nbytes/1e6:.0f} MB")
    t_mat = timed("materialized-a")
    t_med = min(t_seed, t_mat)
    return {
        "metric": "keyswitch_sec",
        "value": t_med,
        "unit": "s",
        "vs_baseline": 0.016 / t_med,  # vs round-1 measured 16 ms
        "limbs": l,
        "seed_compressed_sec": t_seed,
        "materialized_sec": t_mat,
    }


def bench_ntt(logn: int, n_level: int = 68):
    """Fused-NTT microbenchmark over a full ciphertext limb stack."""
    ctx, enc = build(logn, n_level)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(states)[0]
    l = ct.n_limbs
    rows = tuple(range(l))
    CHAIN = 8  # chained roundtrips inside ONE jit: fetch-forced timing has
    # a ~28 ms dispatch+fetch RTT through the axon tunnel that would swamp a
    # single millisecond-scale transform

    def chain(x):
        def body(x, _):
            return ctx._intt(ctx._ntt(x, rows), rows), ()

        return jax.lax.scan(body, x, None, length=CHAIN)[0]

    f = jax.jit(chain)
    x = ct.data
    t0 = time.time()
    out = f(x)
    fetch_sync(out)  # block_until_ready returns EARLY on the axon tunnel
    log(f"warmup (compiles): {time.time()-t0:.1f}s")
    times = []
    for _ in range(10):
        t0 = time.time()
        out = f(x)
        fetch_sync(out)
        times.append((time.time() - t0) / CHAIN)
    t_med = float(np.median(times)) / 2  # one transform (fwd+inv timed)
    ok = bool(np.array_equal(np.asarray(out), np.asarray(x)))
    log(f"ntt roundtrip exact: {ok}")
    return {
        "metric": "ntt_sec",
        "value": t_med,
        "unit": "s",
        "vs_baseline": 0.0025 / t_med,  # vs round-1 measured 2.5 ms
        "rows": 2 * l,
        "correct": ok,
    }


def bench_ntt_mxu(logn: int, n_level: int = 68):
    """Four-step MXU NTT vs the fused Pallas butterfly NTT, same limb
    stack, fetch-forced timing — the measured comparison the round-2
    verdict asked for before landing or retiring core/ntt_mxu.py."""
    from aes_fhe_tpu.core.ntt_mxu import (
        build_mxu_tables, ntt_mxu, intt_mxu,
    )

    ctx, enc = build(logn, n_level)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(states)[0]
    l = ct.n_limbs
    rows = tuple(range(l))
    x = ct.data
    CHAIN = 8

    def timed(tag, fwd, inv):
        def chain(x):
            def body(x, _):
                return inv(fwd(x)), ()

            return jax.lax.scan(body, x, None, length=CHAIN)[0]

        f = jax.jit(chain)
        t0 = time.time()
        out = f(x)
        fetch_sync(out)
        log(f"[{tag}] warmup (compiles): {time.time()-t0:.1f}s")
        times = []
        for _ in range(10):
            t0 = time.time()
            out = f(x)
            fetch_sync(out)
            times.append((time.time() - t0) / CHAIN / 2)
        t_med = float(np.median(times))
        ok = bool(np.array_equal(np.asarray(out), np.asarray(x)))
        log(f"[{tag}] per-transform: {t_med*1e3:.3f} ms  roundtrip exact: {ok}")
        return t_med, ok

    t_pl, ok_pl = timed(
        "pallas",
        lambda v: ctx._ntt(v, rows),
        lambda v: ctx._intt(v, rows),
    )
    mt = build_mxu_tables(
        tuple(ctx.params.all_primes[i] for i in rows), ctx.params.logn
    )
    t_mx, ok_mx = timed(
        "mxu4step",
        lambda v: ntt_mxu(v, mt),
        lambda v: intt_mxu(v, mt),
    )
    return {
        "metric": "ntt_sec",
        "value": min(t_pl, t_mx),
        "unit": "s",
        "vs_baseline": 0.0025 / min(t_pl, t_mx),
        "pallas_sec": t_pl,
        "mxu_sec": t_mx,
        "mxu_vs_pallas": t_pl / t_mx,
        "rows": 2 * l,
        "correct": bool(ok_pl and ok_mx),
    }


def bench_roundtrip(logn: int):
    """COMPLETE homomorphic AES-128: 10-round encrypt + 10-round decrypt
    (correct inverse order, fixing reference quirk Q1) + exact roundtrip —
    the reference's 22,146 s headline (README.md:119), bootstrap-stabilized
    with no secret key in the hot path."""
    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy
    from aes_fhe_tpu.aes import reference as R

    ctx, enc = build(logn, 96, secret_hamming=192)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    key = np.arange(16, dtype=np.uint8)
    rks = R.expand_aes128_key(key)

    want_jit = _os.environ.get("AES_FHE_BENCH_JIT", "1") != "0"
    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=want_jit,
                  merged_stab=_os.environ.get("AES_FHE_MERGED_STAB", "0") == "1",
                  snap_count=int(_os.environ.get("AES_FHE_SNAP_COUNT", "1")),
                  mag_damp=_os.environ.get("AES_FHE_MAG_DAMP", "0") == "1")
    resave_keys(ctx)  # persist the bootstrap DFT keys for warm runs
    t0 = time.time()
    ct = pipe.encrypt_states(states, rks)
    fetch_sync(ct[0].data, ct[1].data)
    log(f"10-round encrypt (incl warmup compiles): {time.time()-t0:.1f}s")

    t0 = time.time()
    ct_enc = pipe.encrypt_states(states, rks)
    fetch_sync(ct_enc[0].data, ct_enc[1].data)
    t_enc = time.time() - t0
    log(f"steady 10-round encrypt: {t_enc:.1f}s")

    want_ct = np.stack([R.aes128_encrypt_state(s, rks) for s in states[:4]])
    ok_enc = bool(np.array_equal(pipe.decode(ct_enc, n_blocks=4), want_ct))
    log(f"encrypt correctness (4 blocks): {ok_enc}")

    t0 = time.time()
    ct_dec = pipe.decrypt_states(ct_enc, rks)
    fetch_sync(ct_dec[0].data, ct_dec[1].data)
    t_dec = time.time() - t0
    log(f"10-round decrypt (incl warmup compiles): {t_dec:.1f}s "
        f"(bootstraps so far: {ctx.stats['bootstrap']})")

    got = pipe.decode(ct_dec, n_blocks=4)
    ok = bool(np.array_equal(got, states[:4]))
    log(f"roundtrip correctness (4 blocks): {ok}")
    total = t_enc + t_dec
    return per_block(
        {
            "metric": "aes128_roundtrip_sec",
            "value": total,
            "unit": "s",
            "correct": ok,
            "encrypt_sec": t_enc,
            "decrypt_sec": t_dec,
            "decrypt_includes_compile": True,
            "exec_path": "jit" if want_jit else "eager",
        },
        ref_sec=22146.0,
        our_blocks=enc.batch,
    )


def bench_boot(logn: int):
    """ONE stacked-pair refresh (hi/lo bootstrap + snap) at the enc10
    chain — the op that dominates the 10-round wall (20-30 of them per
    pass, ~7 s each; DESIGN.md §18) — with wall time and max slot error
    vs the exact zeta16 codewords.  The standalone regression metric the
    round-4 verdict asked for (next-round item 8)."""
    from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy

    n_level = int(_os.environ.get("AES_FHE_ENC10_LEVELS", "0")) or 100
    ctx, enc = build(logn, n_level, secret_hamming=192)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    want_jit = _os.environ.get("AES_FHE_BENCH_JIT", "1") != "0"
    pipe = AES128(ctx, policy=SnapPolicy.BOOTSTRAP, use_jit=want_jit,
                  merged_stab=_os.environ.get("AES_FHE_MERGED_STAB", "0") == "1",
                  snap_count=int(_os.environ.get("AES_FHE_SNAP_COUNT", "1")),
                  mag_damp=_os.environ.get("AES_FHE_MAG_DAMP", "0") == "1")
    resave_keys(ctx)
    ct = enc.encrypt(states)
    # enter at a depleted level, like a post-SubBytes ciphertext (dropping
    # RNS rows is exact), so the refresh measured is the pipeline's
    low = tuple(ctx.drop_limbs(c, c.n_limbs - 8) for c in ct)

    t0 = time.time()
    out = pipe._stabilize(low, None, "boot")
    fetch_sync(out[0].data, out[1].data)
    warm = time.time() - t0
    log(f"warmup refresh (incl compiles/loads): {warm:.1f}s")
    note(phase="steady", metric="bootstrap_pair_sec", value=round(warm, 2),
         partial=False, includes_compile=True,
         landing_limbs=out[0].n_limbs)

    times = []
    for _ in range(3):
        t0 = time.time()
        out = pipe._stabilize(low, None, "boot")
        fetch_sync(out[0].data, out[1].data)
        times.append(time.time() - t0)
    t_med = float(np.median(times))
    log(f"refresh times: {['%.2f' % t for t in times]}")

    got = pipe.decode(out)
    ok = bool(np.array_equal(got, states))
    hi_ideal, lo_ideal = enc.pack_slots(states)
    err = max(
        float(np.max(np.abs(ctx.decrypt_values(out[0]) - hi_ideal))),
        float(np.max(np.abs(ctx.decrypt_values(out[1]) - lo_ideal))),
    )
    log(f"refresh correctness (ALL {enc.batch} blocks): {ok}; "
        f"max slot error {err:.2e} (2^{np.log2(err):.1f})")
    return {
        "metric": "bootstrap_pair_sec",
        "value": t_med,
        "unit": "s",
        "correct": ok,
        "max_slot_error": err,
        "landing_limbs": out[0].n_limbs,
        "exec_path": "jit" if want_jit else "eager",
        "warmup_sec": round(warm, 1),
        "vs_baseline": None,  # the reference has no standalone refresh metric
    }


# Long modes run ~20-40 min by design; the 480 s driver-budget default
# exists for the driver's `python bench.py` round — armed there, it killed
# a builder's own enc10 mid-warmup (round-4, DESIGN.md §20).  Explicit
# AES_FHE_BENCH_BUDGET still wins for every mode.
LONG_MODES = {"enc10", "enc10seg", "dec10", "dec10seg", "roundtrip", "boot"}


def main() -> None:
    mode = sys.argv[1] if len(sys.argv) > 1 else "round"
    logn = int(sys.argv[2]) if len(sys.argv) > 2 else (15 if mode != "ark" else 14)
    if mode in LONG_MODES and "AES_FHE_BENCH_BUDGET" not in _os.environ:
        log(f"watchdog: disarmed by default for long mode {mode!r} "
            "(set AES_FHE_BENCH_BUDGET to arm)")
        _os.environ["AES_FHE_BENCH_BUDGET"] = "0"
    arm_watchdog()
    metric_by_mode = {
        "ark": "aes128_addroundkey_sec",
        "enc10": "aes128_encrypt10_sec",
        "enc10seg": "aes128_encrypt10_sec",
        "dec10": "aes128_decrypt10_sec",
        "dec10seg": "aes128_decrypt10_sec",
        "roundtrip": "aes128_roundtrip_sec",
        "ks": "keyswitch_sec",
        "ntt": "ntt_sec",
        "ntt_mxu": "ntt_sec",
        "invround": "aes128_inv_round_sec",
        "boot": "bootstrap_pair_sec",
    }
    note(phase="context+keygen",
         metric=metric_by_mode.get(mode, "aes128_round_sec"))
    if not mode.endswith("seg"):  # orchestrators must NOT open a TPU client
        log(f"devices: {jax.devices()}  mode={mode} logn={logn}")
    if mode == "ark":
        result = bench_ark(logn)
    elif mode == "enc10":
        result = bench_enc10(logn)
    elif mode == "enc10seg":
        result = bench_enc10_segmented(logn)
    elif mode == "dec10seg":
        result = bench_dec10_segmented(logn)
    elif mode == "dec10":
        result = bench_dec10(logn)
    elif mode == "roundtrip":
        result = bench_roundtrip(logn)
    elif mode == "boot":
        result = bench_boot(logn)
    elif mode == "ks":
        result = bench_ks(logn)
    elif mode == "ntt":
        result = bench_ntt(logn)
    elif mode == "ntt_mxu":
        result = bench_ntt_mxu(logn)
    elif mode == "round58":
        result = bench_round(logn, scale_bits=58)
    else:
        # NOTE the Δ=2^29 depth-diet modes (round29/enc1029) are RETIRED
        # from the bench list (round-4 decision, DESIGN.md §15/§17): at
        # production N the bare 2^29 chain decodes wrong (fresh-encryption
        # noise 2^-12.6 + LUT-ladder amplification), and elevating every
        # LUT ladder to Δ² to fix it costs back ~all of the limb savings
        # (≤15% projected net vs the measured-correct Δ=2^58 chain).  The
        # diet remains bit-exact and regression-tested at logn≤8
        # (tests/test_depth_diet.py); the elevated-tier machinery it
        # produced powers the bootstrap interior on every chain.
        result = bench_round(logn, inverse=(mode == "invround"))
    disarm_watchdog()
    result["total_sec"] = round(time.time() - _T_START, 1)
    if mode == "round" and jax.default_backend() not in ("cpu",):
        _write_round_manifest()
    print(json.dumps(result))


def _write_round_manifest() -> None:
    """Record which export-cache programs the driver's default round used,
    so tests/test_bench_manifest.py can assert (fast, statically) that the
    committed cache still covers them — fingerprint drift then fails the
    test suite instead of the driver's budgeted run (round-4 verdict
    item 3)."""
    from aes_fhe_tpu.ckks.context import CkksContext

    cache = getattr(CkksContext, "_export_cache_obj", None)
    if cache is None or not cache.used:
        return
    path = _os.path.join(
        _os.environ["AES_FHE_EXPORT_CACHE_DIR"], "manifest_round.json"
    )
    with open(path, "w") as f:
        json.dump(
            {"mode": "round", "backend": jax.default_backend(),
             "files": cache.used},
            f, indent=1,
        )
    log(f"round manifest: {len(cache.used)} export programs recorded")


if __name__ == "__main__":
    main()
