"""Per-file test runner: one pytest subprocess per test file.

Why: on some of this environment's hosts, XLA:CPU segfaults after ~60
in-process compilations (observed in `backend_compile_and_load`, and in
persistent-cache (de)serialization before that was disabled) — a single
long pytest process dies mid-suite even though every file passes in
isolation.  Running each file in its own process sidesteps the
accumulation bug and gives crash-isolation for free: a segfaulting file
is REPORTED instead of killing the whole run.

Usage:
    python tools/run_tests.py              # default lane (-m "not slow")
    python tools/run_tests.py --all        # everything incl. slow
    AES_FHE_RUN_SLOW=1 python tools/run_tests.py --all   # + env-gated

Prints one summary line per file and a final JSON verdict.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true", help="include slow tests")
    ap.add_argument("files", nargs="*", help="subset of test files")
    args = ap.parse_args()

    files = args.files or sorted(
        glob.glob(os.path.join(REPO, "tests", "test_*.py"))
    )
    results = []
    t_all = time.time()
    for f in files:
        cmd = [sys.executable, "-m", "pytest", f, "-q", "--no-header"]
        if not args.all:
            cmd += ["-m", "not slow"]
        t0 = time.time()
        proc = subprocess.run(
            cmd, cwd=REPO, capture_output=True, text=True
        )
        dt = time.time() - t0
        tail = (proc.stdout.strip().splitlines() or [""])[-1]
        crashed = proc.returncode in (-11, 134, 139)
        status = (
            "CRASH" if crashed
            else "ok" if proc.returncode in (0, 5)  # 5 = nothing collected
            else "FAIL"
        )
        results.append(
            {"file": os.path.basename(f), "status": status,
             "rc": proc.returncode, "sec": round(dt, 1), "tail": tail}
        )
        print(f"[{status:5s}] {os.path.basename(f):32s} {dt:7.1f}s  {tail}",
              flush=True)
    bad = [r for r in results if r["status"] != "ok"]
    print(json.dumps({
        "total_sec": round(time.time() - t_all, 1),
        "files": len(results),
        "failed": [r["file"] for r in bad],
    }))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
