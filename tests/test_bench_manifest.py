"""Static guards for the driver's budgeted `python bench.py` round.

Round-4 lost the headline bench to a cold-clone warmup: the committed
export cache was stale for HEAD (a re-exported .jaxexp sat untracked) and
the TPU compile cache was absent entirely, so the driver re-exported and
recompiled its way past the 480 s budget (BENCH_r04.json: partial,
timed_out_in=warmup).  These tests make that failure mode a *test-suite*
failure instead of a driver-run failure:

- every export program the last TPU round run recorded in
  manifest_round.json must exist in the committed .jax_export_cache;
- the committed .jax_cache_seed (TPU executables bench.py links into
  .jax_cache on a cold clone) must be present and non-trivial.

They are existence pins, not key recomputations: a code change that shifts
a program signature must be followed by re-running `python bench.py` on
the chip (which refreshes manifest + caches) before committing — if that
step is skipped, the stale manifest keeps passing but the *seed* test
documents the required workflow.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EXPORT_DIR = os.path.join(REPO, ".jax_export_cache")
SEED_DIR = os.path.join(REPO, ".jax_cache_seed")
MANIFEST = os.path.join(EXPORT_DIR, "manifest_round.json")


@pytest.mark.fast
def test_round_manifest_covered_by_committed_export_cache():
    if not os.path.exists(MANIFEST):
        pytest.skip("no manifest yet (bench.py round has not run on TPU)")
    with open(MANIFEST) as f:
        man = json.load(f)
    missing = [
        name for name in man["files"]
        if not os.path.exists(os.path.join(EXPORT_DIR, name))
    ]
    assert not missing, (
        f"export programs used by the driver round are missing from the "
        f"committed cache: {missing} — re-run `python bench.py` on the "
        f"chip and commit the refreshed .jax_export_cache"
    )


@pytest.mark.fast
def test_tpu_seed_cache_present():
    if not os.path.isdir(SEED_DIR):
        pytest.skip(
            "no .jax_cache_seed yet (capture it from a warm TPU round run: "
            "see DESIGN.md round-5 notes)"
        )
    entries = [f for f in os.listdir(SEED_DIR) if f.endswith("-cache")]
    total = sum(
        os.path.getsize(os.path.join(SEED_DIR, f)) for f in entries
    )
    # the driver round needs the big batched AES op executables; a seed
    # that lost them would be implausibly small
    assert len(entries) >= 5 and total > 50_000_000, (
        f"seed cache looks incomplete: {len(entries)} entries, "
        f"{total/1e6:.0f} MB"
    )
