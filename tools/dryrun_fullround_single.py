"""Experiment: the FULL sharded AES round as ONE jitted program on the
8-device virtual CPU mesh (round-2 verdict item: the split-in-two dryrun
means the single-program sharded round had never compiled anywhere).

Run:  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
          python tools/dryrun_fullround_single.py [logn]

Prints one JSON line with the compile time and FIPS check result, so the
"can XLA:CPU partition the whole round?" question has a measured answer.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aes_fhe_tpu.utils.cache_dirs import cpu_cache_dir  # noqa: E402

jax.config.update("jax_compilation_cache_dir", cpu_cache_dir())
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from aes_fhe_tpu.parallel.mesh import make_mesh  # noqa: E402
from aes_fhe_tpu.ckks.types import Ciphertext  # noqa: E402
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy  # noqa: E402
from aes_fhe_tpu.aes import reference as R  # noqa: E402
from __graft_entry__ import _build  # noqa: E402


def main() -> None:
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    n_devices = len(jax.devices())
    tp = 2 if n_devices % 2 == 0 and n_devices > 1 else 1
    mesh = make_mesh(n_devices=n_devices, tp=tp)
    dp = n_devices // tp

    # 38 level primes + 3 base, minus the one prime fresh encryption on
    # thin chains drops immediately (encrypt-high + rescale) = 40 limbs,
    # divisible by tp=2.  ladder_elevate=False: the Δ² S-box tier is a
    # production-ring-size precision requirement, not needed at logn≤8.
    ctx, enc = _build(
        logn=logn, n_level_primes=38, scale_bits=29, dnum=2,
        ladder_elevate=False,
    )
    pipe = AES128(ctx, policy=SnapPolicy.NONE)
    rks = R.expand_aes128_key(np.arange(16, dtype=np.uint8))
    rk1 = pipe.prepare_round_keys(rks)[1]

    rng = np.random.default_rng(0)
    B = 2 * dp
    states = np.stack(
        [rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8) for _ in range(B)]
    )
    cts = [enc.encrypt(s) for s in states]
    a_hi = jnp.stack([c[0].data for c in cts])
    a_lo = jnp.stack([c[1].data for c in cts])
    scale, is_ntt = cts[0][0].scale, cts[0][0].ntt
    out_scale = [None]

    def full_round(ah, al, kh, kl):
        mk = lambda d: Ciphertext(data=d, scale=scale, ntt=is_ntt)
        st = pipe.sub(mk(ah), mk(al))
        st = pipe.shift(st)
        st = pipe.mix(st)
        st = pipe.ark(
            st,
            (
                Ciphertext(data=kh, scale=rk1[0].scale, ntt=True),
                Ciphertext(data=kl, scale=rk1[1].scale, ntt=True),
            ),
        )
        out_scale[0] = st[0].scale
        return st[0].data, st[1].data

    spec = P("dp", None, "tp", None)
    shard = NamedSharding(mesh, spec)
    args = [jax.device_put(x, shard) for x in (a_hi, a_lo)]
    step = jax.jit(
        jax.vmap(full_round, in_axes=(0, 0, None, None)),
        in_shardings=(shard, shard, None, None),
    )
    t0 = time.time()
    lowered = step.lower(*args, rk1[0].data, rk1[1].data)
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    t0 = time.time()
    out = compiled(*args, rk1[0].data, rk1[1].data)
    jax.block_until_ready(out)
    t_run = time.time() - t0

    got = enc.decrypt(
        Ciphertext(data=out[0][0], scale=out_scale[0], ntt=True),
        Ciphertext(data=out[1][0], scale=out_scale[0], ntt=True),
        n_blocks=2,
    )
    want = np.stack(
        [
            R.add_round_key(R.mix_columns(R.shift_rows(R.sub_bytes(s))), rks[1])
            for s in states[0][:2]
        ]
    )
    ok = bool(np.array_equal(got, want))
    print(
        json.dumps(
            {
                "logn": logn,
                "devices": n_devices,
                "dp": dp,
                "tp": tp,
                "lower_sec": round(t_lower, 1),
                "compile_sec": round(t_compile, 1),
                "run_sec": round(t_run, 1),
                "single_program": True,
                "correct": ok,
            }
        )
    )


if __name__ == "__main__":
    main()
