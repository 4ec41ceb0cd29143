#!/bin/bash
# One-shot on-chip validation + measurement session.
#
# The TPU behind this dev host's tunnel dies for hours at a time; when it
# comes back the window may be short.  This script runs everything the
# round needs from a live chip, in priority order, each under its own
# timeout, appending to tools/on_chip_session.log:
#   1. tools/tpu_parity_check.py  — validate all pending Mosaic kernels
#   2. bench.py                   — the driver-contract perf number,
#      gated by tools/perf_floor_gate.py against the last committed chip
#      number x0.8 (a Mosaic scheduling regression passes every CPU test;
#      only this floor catches it); the gate HARD-FAILS on degraded/CPU
#      lines, and its --selftest proves it trips on an injected regression
#   3. tools/ablate_stages.py     — stage deltas + palette-kernel A/B,
#      internally budgeted so it finishes its table inside the timeout
#   4. tools/tpu_serving_check.py — serving artifacts on-chip
#
# Exit status: nonzero if ANY step failed (VERDICT r4: a session whose
# steps silently degrade is not a gate).  Pipe exit codes are taken from
# the command, not tee (pipefail).
#
# Usage: bash tools/on_chip_session.sh
set -u -o pipefail
cd "$(dirname "$0")/.."
LOG=tools/on_chip_session.log
FAILED_FILE=$(mktemp)
: > "$FAILED_FILE"

{
  echo "=== on-chip session $(date -u +%FT%TZ) ==="

  record_rc() {  # record_rc <name> <rc>
    echo "$1 rc=$2"
    if [ "$2" -ne 0 ]; then echo "$1=$2" >> "$FAILED_FILE"; fi
  }

  echo "--- probe ---"
  timeout 120 python -c "
import jax; x = jax.numpy.ones((256,256))
print('probe ok:', (x@x).sum(), jax.default_backend(), jax.devices()[0].device_kind)" \
    || { echo "PROBE FAILED - chip not reachable"; echo probe=1 >> "$FAILED_FILE"; exit 1; }

  echo "--- 1/5 parity ---"
  timeout 1200 python tools/tpu_parity_check.py
  record_rc parity $?

  echo "--- 2/5 bench ---"
  BENCH_OUT=$(mktemp)
  timeout 900 python bench.py | tee "$BENCH_OUT"
  record_rc bench $?
  echo "--- perf floor gate (selftest, then fresh line) ---"
  timeout 60 python tools/perf_floor_gate.py --selftest
  record_rc gate_selftest $?
  timeout 60 python tools/perf_floor_gate.py "$BENCH_OUT"
  record_rc floor_gate $?

  echo "--- 3/5 ablation + kernel A/B ---"
  PHOTOHIVE_ABLATE_BUDGET_S=1050 timeout 1200 python tools/ablate_stages.py 1080 1920 16
  record_rc ablate $?

  echo "--- 4/5 serving artifact on-chip ---"
  timeout 600 python tools/tpu_serving_check.py
  record_rc serving $?

  echo "--- 5/5 session verdict ---"
  if [ -s "$FAILED_FILE" ]; then
    echo "SESSION FAILED steps: $(tr '\n' ' ' < "$FAILED_FILE")"
  else
    echo "SESSION OK: all steps rc=0"
  fi
  echo "=== session done $(date -u +%FT%TZ) ==="
} 2>&1 | tee -a "$LOG"

if [ -s "$FAILED_FILE" ]; then exit 1; fi
exit 0
