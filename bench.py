"""Benchmark: full-report throughput in megapixels/s on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MP/s", "vs_baseline": N}

Measures the on-device compute path: uint8 1080p batches (with crop boxes)
resident on the chip, full report pipeline per batch, a small result leaf
synced to host each iteration.  (This dev environment reaches the TPU over
a ~1.2 GB/s network tunnel, so host->device streaming is tunnel-bound here;
on a real TPU host the PCIe link sustains the ~60 MB per uint8 batch easily
and the corpus driver overlaps uploads with compute.)

Baseline: the reference C library's published per-stage timings sum to
~1.73 s per image on a 12-core CPU (reference README.md:63-75; BASELINE.md);
at the 2 MP (1080p-class) reading that is ~1.19 MP/s.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_MPS = 2.0736 / 1.73  # 1920x1080 MP / published total seconds


def main() -> None:
    import jax

    from photohive_dsp_tpu import ReportConfig
    from photohive_dsp_tpu.models.batch import BatchRunner

    height, width, batch = 1080, 1920, 32
    iters = 8
    cfg = ReportConfig()
    runner = BatchRunner(cfg)

    rng = np.random.default_rng(0)
    frames = [
        jax.device_put(rng.integers(0, 256, (batch, height, width, 3),
                                    dtype=np.uint8))
        for _ in range(2)
    ]
    boxes = np.zeros((batch, 10, 4), np.int32)
    boxes[:, 0] = (100, 500, 200, 900)
    boxes[:, 1] = (400, 900, 600, 1500)
    valid = np.zeros((batch, 10), bool)
    valid[:, :2] = True
    dboxes, dvalid = jax.device_put(boxes), jax.device_put(valid)

    # warmup / compile
    out = runner.run_u8(frames[0], dboxes, dvalid)
    np.asarray(out.blur_bins)

    t0 = time.perf_counter()
    for i in range(iters):
        out = runner.run_u8(frames[i % 2], dboxes, dvalid)
        np.asarray(out.rgb_stats)  # sync the step
    np.asarray(out.blur_bins)
    dt = time.perf_counter() - t0

    mps = batch * height * width / 1e6 * iters / dt
    print(json.dumps({
        "metric": "full_report_throughput_1080p",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / REFERENCE_MPS, 2),
    }))


if __name__ == "__main__":
    if os.environ.get("PHOTOHIVE_NO_PALLAS"):
        main()  # already the fallback run
    else:
        try:
            main()
        except Exception as exc:  # noqa: BLE001 — any fast-path failure
            # Safety net: the XLA path computes identical reports, so a
            # Pallas compile/runtime failure should degrade the number,
            # not zero it.  Fresh subprocess so nothing cached survives.
            print(f"fast path failed ({type(exc).__name__}: {exc}); "
                  "re-running with PHOTOHIVE_NO_PALLAS=1", file=sys.stderr)
            env = dict(os.environ, PHOTOHIVE_NO_PALLAS="1")
            sys.exit(subprocess.call([sys.executable, __file__], env=env))
