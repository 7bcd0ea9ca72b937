"""Wall-clock spans + per-phase tables.

The reference scattered ad-hoc perf_counter spans and kept bootstrap
counters in its engine wrapper (engine_context.py:52-54, 147-170;
temp/mix_columns_enc.py:104-114 phase profiler).  Here: one tiny structured
span API; engine-level counters live on CkksContext.stats (keyswitch /
bootstrap counts) and surface via CkksContext.bootstrap_stats().

For kernel-level TPU profiling use jax.profiler traces; these spans are for
coarse phase accounting (they block on ready, so only wrap completed
device work)."""

from __future__ import annotations

import time
from contextlib import contextmanager

import jax

_spans: list[tuple[str, float]] = []


@contextmanager
def Span(label: str, sync=None):
    """with Span("mixcolumns", sync=ct.data): ... records a wall span;
    pass a jax array (or pytree) to block on before stopping the clock."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            jax.block_until_ready(sync)
        _spans.append((label, time.perf_counter() - t0))


def span_report(clear: bool = True) -> str:
    agg: dict[str, list[float]] = {}
    for label, dt in _spans:
        agg.setdefault(label, []).append(dt)
    lines = [
        f"{label:24s} n={len(ts):3d} total={sum(ts):8.3f}s avg={sum(ts)/len(ts):7.3f}s"
        for label, ts in agg.items()
    ]
    if clear:
        _spans.clear()
    return "\n".join(lines)
