"""Benchmark: full-report throughput in megapixels/s on one chip.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "MP/s", "vs_baseline": N}

Baseline: the reference C library's published per-stage timing transcript
sums to ~1.73 s for one image on a 12-core CPU (reference README.md:63-75;
see BASELINE.md).  The fixture's resolution is unstated; we take the 2 MP
(1080p-class) reading => ~1.19 MP/s as the reference throughput.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

REFERENCE_MPS = 2.0736 / 1.73  # 1920x1080 MP / published total seconds


def main() -> None:
    import jax
    import jax.numpy as jnp

    from photohive_dsp_tpu import ReportConfig
    from photohive_dsp_tpu.models.batch import BatchRunner

    height, width, batch = 1080, 1920, 16
    cfg = ReportConfig()
    runner = BatchRunner(cfg)

    rng = np.random.default_rng(0)
    images = rng.random((batch, 3, height, width)).astype(np.float32)
    boxes = np.zeros((batch, 10, 4), np.int32)
    boxes[:, 0] = (100, 500, 200, 900)
    boxes[:, 1] = (400, 900, 600, 1500)
    valid = np.zeros((batch, 10), bool)
    valid[:, :2] = True

    # warmup / compile
    out = runner.run(images, boxes, valid)
    jax.block_until_ready(out)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        out = runner.run(images, boxes, valid)
        jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    mp = batch * height * width / 1e6
    mps = mp * iters / dt
    print(json.dumps({
        "metric": "full_report_throughput_1080p",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / REFERENCE_MPS, 2),
    }))


if __name__ == "__main__":
    main()
