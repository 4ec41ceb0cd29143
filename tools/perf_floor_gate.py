"""On-chip perf floor: fail when a fresh TPU bench number regresses.

Usage: python tools/perf_floor_gate.py <file-with-bench-json-line>

Reads the LAST JSON line of the given file (bench.py's stdout) and
compares its value against the last committed chip number
(BENCH_LAST_GOOD.json) x FLOOR_FRAC (default 0.8).  Exit codes:

  0  pass (>= floor), or no basis to gate (first-ever chip number,
     degraded/CPU measurement — those are bench.py's own failure modes,
     not kernel regressions)
  1  FAIL: a real chip measurement fell below the floor — a Mosaic/XLA
     scheduling regression CI cannot see (CPU tests and interpret mode
     share none of the chip's lowering); bisect before committing.

The reference's analogous gate is its <0.5 s full-report latency assert
(src/test/test.c:152); ours is relative to the last committed chip
number because absolute latency varies with batch and shape.
"""

from __future__ import annotations

import json
import os
import sys

FLOOR_FRAC = float(os.environ.get("PHOTOHIVE_PERF_FLOOR_FRAC", "0.8"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    if len(sys.argv) != 2:
        print("usage: perf_floor_gate.py <bench-output-file>")
        return 0
    try:
        with open(sys.argv[1]) as f:
            lines = [ln for ln in f if ln.lstrip().startswith("{")]
        fresh = json.loads(lines[-1])
    except (OSError, ValueError, IndexError) as exc:
        print(f"floor gate: no parseable bench line ({exc}); not gating")
        return 0
    if fresh.get("degraded") or fresh.get("platform") in (None, "cpu"):
        print("floor gate: not a fresh chip measurement; not gating")
        return 0
    try:
        with open(os.path.join(REPO, "BENCH_LAST_GOOD.json")) as f:
            cached = json.load(f)
    except (OSError, ValueError):
        print("floor gate: no BENCH_LAST_GOOD.json yet; first chip number "
              "sets the floor")
        return 0
    if cached.get("metric") != fresh.get("metric") \
            or cached.get("batch") != fresh.get("batch"):
        print("floor gate: cached number is a different config; not gating")
        return 0
    floor = cached["value"] * FLOOR_FRAC
    verdict = "PASS" if fresh["value"] >= floor else "FAIL"
    print(f"floor gate {verdict}: fresh {fresh['value']:.2f} "
          f"vs floor {floor:.2f} ({FLOOR_FRAC:.0%} of committed "
          f"{cached['value']:.2f} {cached.get('unit', '')})")
    return 0 if verdict == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())
