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
#      only this floor catches it) — the session exits nonzero on FAIL
#   3. tools/ablate_stages.py     — stage deltas + palette-kernel A/B
#
# Usage: bash tools/on_chip_session.sh
set -u
cd "$(dirname "$0")/.."
LOG=tools/on_chip_session.log
GATE_RC_FILE=$(mktemp)
echo 0 > "$GATE_RC_FILE"
{
  echo "=== on-chip session $(date -u +%FT%TZ) ==="

  echo "--- probe ---"
  timeout 120 python -c "
import jax; x = jax.numpy.ones((256,256))
print('probe ok:', (x@x).sum(), jax.default_backend(), jax.devices()[0].device_kind)" \
    || { echo "PROBE FAILED - chip not reachable"; exit 1; }

  echo "--- 1/4 parity ---"
  timeout 1200 python tools/tpu_parity_check.py
  echo "parity rc=$?"

  echo "--- 2/4 bench ---"
  BENCH_OUT=$(mktemp)
  timeout 900 python bench.py | tee "$BENCH_OUT"
  echo "bench rc=$?"
  echo "--- perf floor gate ---"
  timeout 60 python tools/perf_floor_gate.py "$BENCH_OUT"
  GATE_RC=$?
  echo "floor gate rc=$GATE_RC"
  echo "$GATE_RC" > "$GATE_RC_FILE"

  echo "--- 3/4 ablation + kernel A/B ---"
  timeout 1200 python tools/ablate_stages.py 1080 1920 16
  echo "ablate rc=$?"

  echo "--- 4/4 serving artifact on-chip ---"
  timeout 600 python tools/tpu_serving_check.py
  echo "serving rc=$?"

  echo "=== session done $(date -u +%FT%TZ) ==="
} 2>&1 | tee -a "$LOG"
exit "$(cat "$GATE_RC_FILE")"
