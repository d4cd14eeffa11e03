"""Populate tools/aot/ with serialized compiled executables for every bench
stage, by running each stage subprocess once on the current backend.

Run this on the target chip after any change to model/solver code so the
driver's `python bench.py` finds warm executables (see tools/aot.py — the
cache is keyed by lowered-program hash, so stale entries are simply unused).
Results are also printed, making this double as a full manual bench sweep.

Usage: python tools/gen_aot_cache.py [--prune] [stage ...]  (default: all)

--prune: after a FULL run (no stage list), delete tools/aot/*.bin entries
whose program key was not touched by any stage — i.e. executables for
lowerings that no longer exist. The cache is committed (it is what lets the
driver bench skip 10-20 min remote cold compiles), so stale entries are
dead weight in the repo. Pruning is refused for partial runs: a stage that
didn't run can't vouch for its entries.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402

_KEY_RE = re.compile(r"^\[aot\] ([\w-]+): lower\+hash [\d.]+s key=([0-9a-f]+)")


def main(argv):
    prune = "--prune" in argv
    argv = [a for a in argv if a != "--prune"]
    # full run covers ALL stages incl. the BENCH_STAGES-only opt-ins
    # (sampling/fused/int8) so --prune never drops a still-valid entry
    stages = argv or list(bench.ALL_STAGES)
    if prune and argv:
        print("[gen_aot] --prune requires a full run (no stage list)",
              file=sys.stderr)
        return 2
    results, touched, all_ok = {}, set(), True
    for name in stages:
        cold, _ = bench.STAGE_EST[name]
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"),
                 "--stage", name],
                capture_output=True, text=True, timeout=cold * 3, cwd=REPO)
        except subprocess.TimeoutExpired:
            # a timed-out stage must not abort the sweep (the remaining
            # stages still deserve their regen); it does mark the run
            # not-ok so --prune refuses — a stage that didn't finish
            # can't vouch for its entries
            all_ok = False
            print(f"[gen_aot] {name}: TIMEOUT after {cold * 3}s",
                  file=sys.stderr, flush=True)
            continue
        dur = time.time() - t0
        out = None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                out = json.loads(line)
                break
            except (json.JSONDecodeError, ValueError):
                continue
        for line in (proc.stderr or "").splitlines():
            m = _KEY_RE.match(line)
            if m:
                touched.add(f"{m.group(1)}-{m.group(2)}.bin")
        print(f"[gen_aot] {name}: rc={proc.returncode} {dur:.0f}s -> {out}",
              flush=True)
        if proc.returncode != 0:
            all_ok = False
            print((proc.stderr or "")[-1500:], file=sys.stderr, flush=True)
        if out:
            results[name] = out
    if prune:
        if not all_ok:
            print("[gen_aot] skip prune: a stage failed", file=sys.stderr)
        else:
            for f in sorted(os.listdir(bench.AOT_DIR)):
                if f.endswith(".bin") and f not in touched:
                    os.unlink(os.path.join(bench.AOT_DIR, f))
                    print(f"[gen_aot] pruned stale {f}", flush=True)
    print(json.dumps(results), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
