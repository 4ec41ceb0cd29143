"""On-chip serving-artifact check: export -> reload -> run on the TPU.

Validates that jax.export serializes the Pallas-containing report
program (Mosaic kernels ride along as custom calls) and that the
reloaded artifact reproduces the live jit's results on silicon.  Run
from tools/on_chip_session.sh step 4; exits nonzero on mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    import jax

    from photohive_dsp_tpu import ReportConfig
    from photohive_dsp_tpu.serving import export_report, load_report

    platform = jax.devices()[0].platform
    print(f"backend: {platform}", flush=True)
    cfg = ReportConfig()
    h, w, b = 720, 1080, 4

    blob = export_report(h, w, cfg, batch_size=b)  # backend's fast path
    print(f"exported {len(blob)} bytes", flush=True)
    fn = load_report(blob)

    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (b, h, w, 3), np.uint8)
    boxes = np.zeros((b, 10, 4), np.int32)
    boxes[:, 0] = (50, 400, 100, 800)
    valid = np.zeros((b, 10), bool)
    valid[:, 0] = True
    out = fn(u8, boxes, valid)

    from photohive_dsp_tpu.models.batch import _compiled_u8_batch_fn, \
        _kernel_variant
    live_fn, tables = _compiled_u8_batch_fn(h, w, cfg, _kernel_variant())
    ref = live_fn(u8, boxes, valid, tables)

    ok = True
    if not np.array_equal(np.asarray(out.palette_n),
                          np.asarray(ref.palette_n)):
        print("MISMATCH palette_n", flush=True)
        ok = False
    for i in range(b):
        n = int(ref.palette_n[i])
        if not np.array_equal(np.asarray(out.palette_ids[i])[:n],
                              np.asarray(ref.palette_ids[i])[:n]):
            print(f"MISMATCH palette_ids img {i}", flush=True)
            ok = False
    for name, tol in (("rgb_stats", 1e-5), ("blur_bins", 1e-4),
                      ("sharpness", 1e-3)):
        a = np.asarray(getattr(out, name))
        r = np.asarray(getattr(ref, name))
        rel = np.max(np.abs(a - r) / (np.abs(r) + 1e-6))
        if rel > tol:
            print(f"MISMATCH {name}: max rel {rel:.2e} > {tol}", flush=True)
            ok = False
    print("serving artifact parity:", "OK" if ok else "FAILED", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
