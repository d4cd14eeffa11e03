"""Populate tools/aot/ with serialized compiled executables for every bench
stage, by running each stage subprocess once on the current backend.

Run this on the target chip after any change to model/solver code so the
driver's `python bench.py` finds warm executables (see tools/aot.py — the
cache is keyed by lowered-program hash, so stale entries are simply unused).
Results are also printed, making this double as a full manual bench sweep.

Usage: python tools/gen_aot_cache.py [stage ...]   (default: all stages)
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402


def main(argv):
    stages = argv or list(bench.STAGES)
    results = {}
    for name in stages:
        cold, _ = bench.STAGE_EST[name]
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py"), "--stage", name],
            capture_output=True, text=True, timeout=cold * 3, cwd=REPO)
        dur = time.time() - t0
        out = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        print(f"[gen_aot] {name}: rc={proc.returncode} {dur:.0f}s -> {out}",
              flush=True)
        if proc.returncode != 0:
            print((proc.stderr or "")[-1500:], file=sys.stderr, flush=True)
        if out:
            results[name] = out
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
