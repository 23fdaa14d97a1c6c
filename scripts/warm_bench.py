#!/usr/bin/env python
"""Seed the persistent XLA compile cache with the EXACT bench.py programs.

Round-4 post-mortem (VERDICT r4, weak #1): the driver's bench run recorded a
0.0 headline because the flagship 71M-param train-step program compiled cold —
`scripts/warm_cache.py` seeds only the tiny smoke-model programs the *test
suite* shares, and two round-4 commits changed the flagship program after any
earlier seeding, so the persistent cache could not hit.  On this 1-vCPU tunnel
box the flagship compile alone exceeds the 900 s row budget.

This script runs every `bench.py` measurement mode as the same subprocess the
driver-run bench spawns — identical code path ⇒ identical HLO.

MEASURED REALITY (round 5, 2026-08-20): the axon platform does NOT persist
TPU executables into `.jax_compile_cache/` — after a full warm-bench pass the
cache holds only small CPU programs (the flagship `jit_train_step` entry
there is the tiny-net CPU one from the test suite).  Compilation happens in
the remote compile helper, so the value of this script is (a) any
server-side caching the helper does for identical HLO, and (b) a full dry
run proving every bench mode executes.  The hard guarantee for the driver's
bench is in bench.py itself: a *preliminary* cumulative train row after
compile + 5 timed steps (~6-7 min from fully cold on an idle box; measured
613.6 ms/step cold path 2026-08-20) plus a 1500 s row budget for train256.

RUN THIS AFTER ANY COMMIT THAT CHANGES A PROGRAM ON THE BENCH PATH
(model/ops/task/optimizer code — e.g. round 4's hash-dropout default and
`s2b_conv` knob were exactly such changes).  `make warm-bench` is the entry
point; safe to re-run unconditionally (~30-40 min, one mode at a time —
NEVER run it while anything else touches the chip: a concurrent process
degrades a running measurement to ~50 s/step).

Usage: python scripts/warm_bench.py [mode ...]   (default: all modes)
"""

from __future__ import annotations

import subprocess
import sys
import time
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
BENCH = REPO_ROOT / "bench.py"
ALL_MODES = ("train256", "gen256", "gen512", "train512")


def main() -> None:
    modes = sys.argv[1:] or list(ALL_MODES)
    failures = []
    for mode in modes:
        t0 = time.time()
        print(f"# warm-bench: {mode} ...", flush=True)
        proc = subprocess.run([sys.executable, str(BENCH), mode],
                              cwd=REPO_ROOT, capture_output=True, text=True)
        dt = time.time() - t0
        tail = "\n".join((proc.stdout + proc.stderr).strip().splitlines()[-4:])
        print(tail, flush=True)
        if proc.returncode != 0:
            failures.append(mode)
            print(f"# warm-bench: {mode} FAILED (rc={proc.returncode}, {dt:.0f}s)", flush=True)
        else:
            print(f"# warm-bench: {mode} warmed in {dt:.0f}s", flush=True)
    if failures:
        raise SystemExit(f"warm-bench failures: {failures}")
    print("# warm-bench: all bench programs in .jax_compile_cache", flush=True)


if __name__ == "__main__":
    main()
