"""dp-scaling measurement on the virtual CPU mesh (weak scaling).

Measures a keyswitch-heavy representative op (AddRoundKey = two XOR4 LUT
evaluations: 16 power-basis multiplies + 2 relinearizations + conjugations)
over a batch of independent ciphertext pairs vmapped+sharded across dp
devices, with per-device work held constant (weak scaling: B = dp pairs).

Perfect scaling => wall time flat as dp grows.  On the virtual CPU mesh all
"devices" share the same host cores, so absolute times mean little, but the
collective structure is real: GSPMD must insert no cross-device traffic for
dp (data parallel is embarrassingly parallel over pairs), so any time growth
beyond host-core contention indicates an accidental collective — the thing
this harness exists to catch.  Run:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tools/scaling_bench.py

Prints one JSON line per dp with wall time and the HLO collective count.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from aes_fhe_tpu.utils.cache_dirs import configure_cpu_cache  # noqa: E402

configure_cpu_cache(jax.config)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402
from aes_fhe_tpu.params import make_params  # noqa: E402
from aes_fhe_tpu.ckks import CkksContext  # noqa: E402
from aes_fhe_tpu.ckks.types import Ciphertext  # noqa: E402
from aes_fhe_tpu.aes.state import StateEncoder  # noqa: E402
from aes_fhe_tpu.aes.ops import Xor4, rotation_steps_required  # noqa: E402
from aes_fhe_tpu.parallel.mesh import make_mesh  # noqa: E402


_COLL_RE = None


def count_collectives(compiled) -> int:
    """Count collective ops in the POST-SPMD-partitioner optimized HLO.

    Round-2 advisor finding: grepping the pre-partitioning lowered StableHLO
    always counted 0 (GSPMD inserts collectives during compile, and the
    hyphenated HLO spellings never appear in StableHLO).  So: take
    ``jit.lower(...).compile().as_text()`` and match instruction DEFINITIONS
    (opcode followed by '(') in both hyphenated HLO and underscored StableHLO
    spellings."""
    global _COLL_RE
    import re

    if _COLL_RE is None:
        ops = [
            "all-reduce", "all-gather", "all-to-all", "collective-permute",
            "reduce-scatter", "all-reduce-start", "collective-permute-start",
            "stablehlo.all_reduce", "stablehlo.all_gather",
            "stablehlo.all_to_all", "stablehlo.collective_permute",
            "stablehlo.reduce_scatter",
        ]
        _COLL_RE = re.compile(
            r"\b(" + "|".join(re.escape(o) for o in ops) + r")\("
        )
    txt = compiled.as_text()
    return len(_COLL_RE.findall(txt))


def positive_control(ctx, enc, rng) -> int:
    """Prove the counter can detect collectives: a relinearization with the
    RNS-limb axis sharded over tp MUST insert cross-device traffic (the
    gadget decomposition's base conversion contracts over limbs).  Returns
    the collective count; the harness asserts it is > 0."""
    mesh = make_mesh(n_devices=8, tp=8)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(states)[0]
    l = (ct.n_limbs // 8) * 8  # limb axis must divide the tp mesh
    a = ct.data[1][:l]
    # limb axis sharded over tp; the keyswitch contracts over it
    shard = NamedSharding(mesh, P("tp", None))
    a_sh = jax.device_put(a, shard)
    step = jax.jit(
        lambda x: ctx._keyswitch_impl(x, ctx.keys.relin, l),
        in_shardings=(shard,),
    )
    return count_collectives(step.lower(a_sh).compile())


def main() -> None:
    logn, n_level = 8, 14
    params = make_params(logn=logn, n_level_primes=n_level, dnum=3)
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=tuple(rotation_steps_required(stride)),
        conjugation=True,
    )
    enc = StateEncoder(ctx)
    xor4 = Xor4(ctx)
    rng = np.random.default_rng(0)

    def one(ah, al, kh, kl):
        scale = ctx.default_scale()
        mk = lambda d: Ciphertext(data=d, scale=scale, ntt=True)
        hi = xor4(mk(ah), mk(kh))
        lo = xor4(mk(al), mk(kl))
        return hi.data, lo.data

    results = []
    for dp in (1, 2, 4, 8):
        mesh = make_mesh(n_devices=dp, tp=1)
        B = dp  # weak scaling: one pair per device
        states = rng.integers(0, 256, (B, enc.batch, 16), dtype=np.uint8)
        keys = rng.integers(0, 256, (B, enc.batch, 16), dtype=np.uint8)
        cts = [enc.encrypt(s) for s in states]
        kts = [enc.encrypt(k) for k in keys]
        arrs = [
            jnp.stack([c[0].data for c in cts]),
            jnp.stack([c[1].data for c in cts]),
            jnp.stack([k[0].data for k in kts]),
            jnp.stack([k[1].data for k in kts]),
        ]
        shard = NamedSharding(mesh, P("dp", None, None, None))
        args = [jax.device_put(a, shard) for a in arrs]
        step = jax.jit(
            jax.vmap(one), in_shardings=(shard,) * 4
        )
        ncoll = count_collectives(step.lower(*args).compile())
        out = step(*args)
        jax.block_until_ready(out)  # CPU backend: ready means done
        times = []
        for _ in range(5):
            t0 = time.time()
            out = step(*args)
            jax.block_until_ready(out)
            times.append(time.time() - t0)
        t = float(np.median(times))
        results.append(
            {"dp": dp, "pairs": B, "sec": round(t, 4), "collectives": ncoll}
        )
        print(json.dumps(results[-1]), flush=True)

    t1 = results[0]["sec"]
    for r in results:
        r["weak_scaling_eff"] = round(t1 / r["sec"], 3)

    # positive control: the counter must DETECT collectives when they exist
    # (tp-sharded keyswitch contracts over the limb axis)
    n_tp = positive_control(ctx, enc, rng)
    assert n_tp > 0, (
        "positive control failed: tp-sharded keyswitch shows no collectives "
        "- the counter is broken"
    )
    print(json.dumps({"table": results, "tp_keyswitch_collectives": n_tp}))


if __name__ == "__main__":
    main()
