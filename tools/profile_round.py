"""Profile the homomorphic AES round on the real TPU: where does time go?

Times keygen phases, individual engine verbs (keyswitch, rescale, scalar
mul), and each AES op (xor4/ark, sub_bytes, shift_rows, mix_columns) with
eager glue + per-kernel jits, printing a phase table to stderr.

Usage: python tools/profile_round.py [logn] [n_level_primes]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


class T:
    def __init__(self):
        self.rows = []

    def __call__(self, label):
        return _Span(self, label)


class _Span:
    def __init__(self, t, label):
        self.t, self.label = t, label

    def __enter__(self):
        self.t0 = time.time()
        return self

    def __exit__(self, *exc):
        dt = time.time() - self.t0
        self.t.rows.append((self.label, dt))
        log(f"  {self.label:<40s} {dt:8.2f}s")


def main():
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    n_levels = int(sys.argv[2]) if len(sys.argv) > 2 else 68
    log(f"devices: {jax.devices()}")
    t = T()

    from aes_fhe_tpu.params import make_params
    from aes_fhe_tpu.ckks import CkksContext
    from aes_fhe_tpu.aes.state import StateEncoder
    from aes_fhe_tpu.aes.ops import (
        rotation_steps_required,
        Xor4,
        SubBytes,
        ShiftRows,
        MixColumns,
        AddRoundKey,
    )
    import aes_fhe_tpu.ckks.context as ckks_ctx_mod

    with t("make_params"):
        params = make_params(logn=logn, n_level_primes=n_levels, dnum=3)
    stride = params.n_slots // 16

    # instrument context internals
    with t("CkksContext.__init__ (tables)"):
        # split keygen out by subclass trick: time tables separately
        class _Ctx(CkksContext):
            def _keygen(self):
                self._t_tables = time.time()
                return super()._keygen()

        ctx = _Ctx(
            params, seed=7, rotations=tuple(rotation_steps_required(stride))
        )
    log(f"    L={params.n_limbs} K={params.n_special} groups={len(params.groups)}")

    enc = StateEncoder(ctx)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    keys = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    with t("encrypt state+key"):
        ct = enc.encrypt(states)
        kt = enc.encrypt(keys)
        jax.block_until_ready((ct[0].data, kt[0].data))

    # --- micro: keyswitch + rescale at full level -------------------------
    from aes_fhe_tpu.ckks.types import Ciphertext

    l = ct[0].n_limbs
    with t("keyswitch warm (l=full) x1 compile"):
        d = ctx._keyswitch(ct[0].data[1], ctx.keys.relin, l)
        jax.block_until_ready(d)
    with t("keyswitch x10 (l=full)"):
        for _ in range(10):
            d = ctx._keyswitch(ct[0].data[1], ctx.keys.relin, l)
        jax.block_until_ready(d)
    with t("rescale x10 warm+run"):
        x = ct[0]
        for _ in range(10):
            x = ctx.rescale(ctx.mul_scalar(x, 1.0, ctx.default_scale()), 1)
        jax.block_until_ready(x.data)
    with t("mul_scalar x20 (eager)"):
        for _ in range(20):
            y = ctx.mul_scalar(ct[0], 0.7 + 0.1j, ctx.default_scale())
        jax.block_until_ready(y.data)
    with t("tensor+relin+rescale (multiply) x5"):
        for _ in range(5):
            z = ctx.multiply(ct[0], ct[1], drop=2)
        jax.block_until_ready(z.data)
    with t("rotate x5"):
        for _ in range(5):
            r = ctx.rotate(ct[0], -stride)
        jax.block_until_ready(r.data)
    with t("rotate_many [3] x2"):
        for _ in range(2):
            rs = ctx.rotate_many(ct[0], [-4 * stride, -8 * stride, -12 * stride])
        jax.block_until_ready(rs[-1].data)

    # --- AES ops -----------------------------------------------------------
    xor4 = Xor4(ctx)
    ark = AddRoundKey(xor4)
    with t("xor4 single (warm incl compiles)"):
        o = xor4(ct[0], kt[0])
        jax.block_until_ready(o.data)
    with t("xor4 single (steady)"):
        o = xor4(ct[0], kt[0])
        jax.block_until_ready(o.data)
    ks0 = ctx.stats["keyswitch"]
    with t("ark pair (steady)"):
        st = ark(ct, kt)
        jax.block_until_ready((st[0].data, st[1].data))
    log(f"    ark keyswitches: {ctx.stats['keyswitch'] - ks0}")

    sub = SubBytes(ctx)
    with t("sub_bytes (warm incl compiles)"):
        sb = sub(st[0], st[1])
        jax.block_until_ready((sb[0].data, sb[1].data))
    ks0 = ctx.stats["keyswitch"]
    with t("sub_bytes (steady)"):
        sb = sub(st[0], st[1])
        jax.block_until_ready((sb[0].data, sb[1].data))
    log(f"    sub_bytes keyswitches: {ctx.stats['keyswitch'] - ks0}")

    shift = ShiftRows(ctx, stride)
    with t("shift_rows (warm)"):
        sr = shift(sb)
        jax.block_until_ready((sr[0].data, sr[1].data))
    ks0 = ctx.stats["keyswitch"]
    with t("shift_rows (steady)"):
        sr = shift(sb)
        jax.block_until_ready((sr[0].data, sr[1].data))
    log(f"    shift_rows keyswitches: {ctx.stats['keyswitch'] - ks0}")

    mix = MixColumns(ctx, xor4, stride)
    with t("mix_columns (warm)"):
        mc = mix(sr)
        jax.block_until_ready((mc[0].data, mc[1].data))
    ks0 = ctx.stats["keyswitch"]
    with t("mix_columns (steady)"):
        mc = mix(sr)
        jax.block_until_ready((mc[0].data, mc[1].data))
    log(f"    mix_columns keyswitches: {ctx.stats['keyswitch'] - ks0}")

    ks0 = ctx.stats["keyswitch"]
    with t("ark final (steady)"):
        fin = ark(mc, kt)
        jax.block_until_ready((fin[0].data, fin[1].data))

    total_steady = sum(
        dt for label, dt in t.rows if "(steady)" in label or "final" in label
    )
    log(f"\nsteady-state round estimate: {total_steady:.2f}s")
    log(f"total keyswitches: {ctx.stats['keyswitch']}")


if __name__ == "__main__":
    main()
