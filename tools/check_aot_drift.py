"""Fast AOT lowering-drift check: verify every committed executable in
tools/aot/ still matches the CURRENT lowering of its bench stage, without
compiling or timing anything.

Why: the driver's `python bench.py` only skips the 10-20 min remote cold
compiles when the committed cache keys match the live lowered StableHLO
(tools/aot.py). Lowerings have drifted between sessions with no visible
code change to the stage (docs/ROUND5.md §9: four stages silently drifted),
and a full `gen_aot_cache.py` regen sweep costs ~25 min on-chip. This check
lowers each stage's MAIN program (host-side, no backend compile) and checks
its key against tools/aot/, flagging drift in ~30-60 s per stage. Helper
programs (inits/perturb/quant) still load+execute through the cache, so
their hit/miss lines are parsed from the same run.

Usage:
  python tools/check_aot_drift.py [stage ...]    # default: bench.ALL_STAGES
  python tools/check_aot_drift.py --stage NAME   # child mode (internal)

Exit 0 = every checked stage's main program HIT and no helper missed;
exit 1 = drift found (regen the listed stages: gen_aot_cache.py <stage...>).
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_CHECK_RE = re.compile(r"^\[aot\] ([\w-]+): CHECK (HIT|MISS)")
_MISS_RE = re.compile(r"^\[aot\] ([\w-]+): AOT cache miss")
_HIT_RE = re.compile(r"^\[aot\] ([\w-]+): AOT cache hit")


def _child(stage: str) -> int:
    """Run one bench stage with its main program in lower-only mode."""
    import bench
    from tools.aot import LowerOnlyDone

    main = bench._STAGE_AOT_NAME.get(stage, stage)
    os.environ["AOT_LOWER_ONLY"] = main
    # helpers still execute once each; keep the timing loop off the clock
    os.environ.setdefault("BENCH_WARMUP", "0")
    os.environ.setdefault("BENCH_REPS", "1")
    fn = getattr(bench, f"stage_{stage}")
    try:
        fn()
    except LowerOnlyDone as e:
        return 0 if e.hit else 4
    # the stage never built a program under the expected name — a rename
    # would silently skip the check, so fail loudly
    print(f"[drift] stage {stage}: main program '{main}' never lowered",
          file=sys.stderr)
    return 5


def main(argv):
    if len(argv) >= 2 and argv[0] == "--stage":
        return _child(argv[1])

    import bench

    stages = argv or list(bench.ALL_STAGES)
    drifted, helper_misses, errors = [], [], []
    for name in stages:
        t0 = time.time()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                capture_output=True, text=True, timeout=600, cwd=REPO)
        except subprocess.TimeoutExpired:
            errors.append(name)
            print(f"[drift] {name}: TIMEOUT after 600s", flush=True)
            continue
        checks, misses, hits = [], [], []
        for line in (proc.stderr or "").splitlines():
            m = _CHECK_RE.match(line)
            if m:
                checks.append(m.group(2))
            m = _MISS_RE.match(line)
            if m:
                misses.append(m.group(1))
            m = _HIT_RE.match(line)
            if m:
                hits.append(m.group(1))
        dur = time.time() - t0
        if proc.returncode == 0 and checks == ["HIT"] and not misses:
            print(f"[drift] {name}: OK ({dur:.0f}s, main HIT, "
                  f"helpers hit: {','.join(hits) or 'none'})", flush=True)
        elif proc.returncode == 4 or "MISS" in checks:
            drifted.append(name)
            print(f"[drift] {name}: DRIFT — main program key not in "
                  f"tools/aot/ ({dur:.0f}s)", flush=True)
        elif misses:
            helper_misses.append(name)
            print(f"[drift] {name}: helper miss: {','.join(misses)} "
                  f"({dur:.0f}s)", flush=True)
        else:
            errors.append(name)
            print(f"[drift] {name}: ERROR rc={proc.returncode} ({dur:.0f}s)",
                  flush=True)
            print((proc.stderr or "")[-1500:], file=sys.stderr, flush=True)
    summary = {"checked": stages, "drifted": drifted,
               "helper_misses": helper_misses, "errors": errors}
    print(json.dumps(summary), flush=True)
    if drifted or helper_misses or errors:
        regen = sorted(set(drifted) | set(helper_misses))
        if regen:
            print(f"[drift] regen with: python tools/gen_aot_cache.py "
                  f"{' '.join(regen)}", flush=True)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
