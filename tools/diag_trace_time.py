"""Where does bench warmup time go? Split trace / lower / compile(cached)
for the heaviest per-op program (SubBytes basis+accumulate) at bench shapes.

Round-2 finding being quantified: with a fully warm persistent compile
cache, `bench.py round` still spent ~10-18 min in "warmup" — the suspicion
is Python tracing + lowering of the giant op programs (every process
restart re-traces; only the XLA compile step is disk-cached).

Run on the real TPU:  python tools/diag_trace_time.py [logn] [scale_bits]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np
import jax

_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from aes_fhe_tpu.params import make_params  # noqa: E402
from aes_fhe_tpu.ckks import CkksContext  # noqa: E402
from aes_fhe_tpu.aes.state import StateEncoder  # noqa: E402
from aes_fhe_tpu.aes.pipeline import AES128, SnapPolicy  # noqa: E402
from aes_fhe_tpu.aes.ops import rotation_steps_required  # noqa: E402


def main() -> None:
    logn = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    scale_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 29
    n_level = 68 if scale_bits == 58 else 40
    t0 = time.time()
    params = make_params(
        logn=logn, n_level_primes=n_level, dnum=3, scale_bits=scale_bits
    )
    stride = params.n_slots // 16
    ctx = CkksContext(
        params,
        seed=7,
        rotations=tuple(rotation_steps_required(stride)),
        conjugation=True,
    )
    enc = StateEncoder(ctx)
    print(f"context+keygen: {time.time()-t0:.1f}s", flush=True)

    pipe = AES128(ctx, policy=SnapPolicy.NONE, use_jit=False)
    rng = np.random.default_rng(0)
    states = rng.integers(0, 256, (enc.batch, 16), dtype=np.uint8)
    ct = enc.encrypt(states)

    # the heaviest single program: SubBytes basis build, as jit_fn stages it
    def basis_fn(st, a, b):
        old = ctx._swap_state(st)
        try:
            return pipe.sub._build_basis(a, b)
        finally:
            ctx._restore_state(old)

    st = ctx.traced_state()
    jf = jax.jit(basis_fn)
    t0 = time.time()
    traced = jf.trace(st, ct[0], ct[1])
    t_trace = time.time() - t0
    t0 = time.time()
    lowered = traced.lower()
    t_lower = time.time() - t0
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    print(
        f"sub-basis program: trace {t_trace:.1f}s  lower {t_lower:.1f}s  "
        f"compile(cache) {t_compile:.1f}s",
        flush=True,
    )
    t0 = time.time()
    out = compiled(st, ct[0], ct[1])
    jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"execute: {time.time()-t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
