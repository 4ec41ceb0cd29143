"""On-chip perf floor: fail when a fresh TPU bench number regresses.

Usage: python tools/perf_floor_gate.py <file-with-bench-json-line>
       python tools/perf_floor_gate.py --selftest

Reads the LAST JSON line of the given file (bench.py's stdout) and
compares its value against the last committed chip number
(BENCH_LAST_GOOD.json) x FLOOR_FRAC (default 0.8).  Exit codes:

  0  pass (>= floor), or first-ever chip number (nothing to gate against)
  1  FAIL: a real chip measurement fell below the floor — a Mosaic/XLA
     scheduling regression CI cannot see (CPU tests and interpret mode
     share none of the chip's lowering); bisect before committing.
  2  FAIL: the input is not a gateable fresh chip measurement (missing/
     unparseable line, degraded, or CPU fallback).  A gate that no-ops
     on stale input is not a gate (VERDICT r4): when the chip session's
     bench step could not produce a fresh chip line, the session FAILS
     and must be re-run — it must not silently bless old numbers.

``--selftest`` proves the gate trips: it synthesizes a regressed line
against the committed BENCH_LAST_GOOD and asserts rc=1, a passing line
asserts rc=0, and a degraded line asserts rc=2.

The reference's analogous gate is its <0.5 s full-report latency assert
(src/test/test.c:152); ours is relative to the last committed chip
number because absolute latency varies with batch and shape.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

FLOOR_FRAC = float(os.environ.get("PHOTOHIVE_PERF_FLOOR_FRAC", "0.8"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _committed_baseline():
    """The COMMITTED BENCH_LAST_GOOD.json (git HEAD), not the working
    tree: bench.py rewrites the working-tree file during its own run, so
    gating against it would always compare the fresh number to itself
    (observed in the round-5 session — the gate never could trip).
    Falls back to the working-tree file outside a git checkout."""
    import subprocess
    try:
        out = subprocess.run(
            ["git", "-C", REPO, "show", "HEAD:BENCH_LAST_GOOD.json"],
            capture_output=True, text=True, timeout=30)
        if out.returncode == 0 and out.stdout.strip():
            return json.loads(out.stdout)
    except (OSError, ValueError, subprocess.SubprocessError):
        pass
    try:
        with open(os.path.join(REPO, "BENCH_LAST_GOOD.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def gate(path: str) -> int:
    try:
        with open(path) as f:
            lines = [ln for ln in f if ln.lstrip().startswith("{")]
        fresh = json.loads(lines[-1])
    except (OSError, ValueError, IndexError) as exc:
        print(f"floor gate FAIL: no parseable bench line ({exc})")
        return 2
    if fresh.get("degraded") or fresh.get("platform") in (None, "cpu"):
        print("floor gate FAIL: not a fresh chip measurement "
              f"(degraded={fresh.get('degraded')!r}, "
              f"platform={fresh.get('platform')!r}) — stale input does "
              "not pass the gate")
        return 2
    cached = _committed_baseline()
    if cached is None:
        print("floor gate: no committed BENCH_LAST_GOOD.json yet; first "
              "chip number sets the floor")
        return 0
    if cached.get("metric") != fresh.get("metric") \
            or cached.get("batch") != fresh.get("batch"):
        print("floor gate FAIL: cached number is a different config "
              f"(metric/batch {cached.get('metric')}/{cached.get('batch')} "
              f"vs {fresh.get('metric')}/{fresh.get('batch')}) — cannot "
              "certify; re-baseline BENCH_LAST_GOOD deliberately")
        return 2
    # Gate on the dispatch-free chip metric when both sides carry it: the
    # pipelined headline swings with the dev tunnel's health (observed
    # 682 -> 507 MP/s purely from host_link 50 -> 34 MB/s while marginal
    # ROSE 1283 -> 1325), and a Mosaic/scheduling regression — the thing
    # this gate exists to catch — shows in the marginal rate first.
    key = ("marginal_mps" if "marginal_mps" in fresh
           and "marginal_mps" in cached else "value")
    floor = cached[key] * FLOOR_FRAC
    verdict = "PASS" if fresh[key] >= floor else "FAIL"
    print(f"floor gate {verdict} [{key}]: fresh {fresh[key]:.2f} "
          f"vs floor {floor:.2f} ({FLOOR_FRAC:.0%} of committed "
          f"{cached[key]:.2f} {cached.get('unit', '')})")
    return 0 if verdict == "PASS" else 1


def selftest() -> int:
    """Prove the gate trips on an injected regression (VERDICT r4).
    Synthesizes from the COMMITTED baseline (the same one gate() reads)
    so the passing case is self-consistent even while bench.py has
    rewritten the working-tree cache."""
    cached = _committed_baseline()
    if cached is None:
        print("selftest: no BENCH_LAST_GOOD.json; synthesizing is "
              "meaningless without a committed floor — SKIP (rc 0)")
        return 0
    key = "marginal_mps" if "marginal_mps" in cached else "value"

    def run_case(mutate, want_rc, label):
        fake = dict(cached)
        fake.pop("degraded", None)
        mutate(fake)
        with tempfile.NamedTemporaryFile("w", suffix=".json",
                                         delete=False) as f:
            f.write(json.dumps(fake) + "\n")
            path = f.name
        rc = gate(path)
        os.unlink(path)
        ok = rc == want_rc
        print(f"selftest {label}: rc={rc} want={want_rc} "
              f"{'ok' if ok else '** FAILED **'}")
        return ok

    ok = True
    ok &= run_case(lambda d: d.update({key: cached[key] * 0.5}),
                   1, "injected regression trips")
    ok &= run_case(lambda d: None, 0, "committed value passes")
    ok &= run_case(lambda d: d.update(degraded="synthetic"),
                   2, "degraded line fails")
    print("selftest", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main() -> int:
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        return selftest()
    if len(sys.argv) != 2:
        print("usage: perf_floor_gate.py <bench-output-file>|--selftest")
        return 2
    return gate(sys.argv[1])


if __name__ == "__main__":
    sys.exit(main())
