"""Fixed-dispatch-overhead probe: separates per-call cost from per-pixel
cost on the tunneled TPU.

Two measurements:
  1. trivial dispatch — a jitted (8,128)+1 in a sync loop: pure
     host->device->host round-trip + runtime overhead, no real compute;
  2. batch sweep of the fused report program — fit wall = fixed + k*MP
     to see how much of the measured 1080p wall is amortizable.

Usage: python tools/dispatch_probe.py [batches...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def trivial():
    f = jax.jit(lambda x: x + 1.0)
    x = jax.device_put(np.zeros((8, 128), np.float32))
    np.asarray(f(x))
    ts = []
    for _ in range(12):
        t0 = time.perf_counter()
        np.asarray(f(x))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    print(f"trivial dispatch: min {ts[0]*1000:.1f} ms, "
          f"median {ts[len(ts)//2]*1000:.1f} ms")


def sweep(batches):
    from photohive_dsp_tpu.config import ReportConfig
    from photohive_dsp_tpu.models.batch import _want_pallas
    from photohive_dsp_tpu.models.pipeline import (ReportTables,
                                                   full_report_batched)
    import functools

    height, width = 1080, 1920
    cfg = ReportConfig()
    tables = ReportTables.build(height, width, cfg)
    use_pallas = _want_pallas()
    rng = np.random.default_rng(0)
    pts = []
    for b in batches:
        fn = jax.jit(functools.partial(full_report_batched, cfg=cfg,
                                       use_pallas=use_pallas))
        rgb = jax.device_put(
            rng.random((b, 3, height, width), np.float32))
        boxes = np.zeros((b, 10, 4), np.int32)
        boxes[:, 0] = (100, 500, 200, 900)
        boxes[:, 1] = (400, 900, 600, 1500)
        valid = np.zeros((b, 10), bool)
        valid[:, :2] = True
        db, dv = jax.device_put(boxes), jax.device_put(valid)
        out = fn(rgb, db, dv, tables)
        np.asarray(out.rgb_stats)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = fn(rgb, db, dv, tables)
            np.asarray(out.rgb_stats)
            np.asarray(out.blur_bins)
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        mp = b * height * width / 1e6
        pts.append((mp, t))
        print(f"batch {b:3d}: {t*1000:7.1f} ms  ({mp/t:6.1f} MP/s)")
        del rgb, out
    if len(pts) >= 2:
        # least squares wall = fixed + k * MP
        a = np.array([[1.0, mp] for mp, _ in pts])
        y = np.array([t for _, t in pts])
        (fixed, k), *_ = np.linalg.lstsq(a, y, rcond=None)
        print(f"fit: fixed {fixed*1000:.1f} ms + {k*1000:.3f} ms/MP "
              f"(marginal {1/k/1e6:.2f} GP/s)")


if __name__ == "__main__":
    batches = [int(x) for x in sys.argv[1:]] or [4, 8, 16, 32]
    trivial()
    sweep(batches)
