"""On-chip A/B of palette-kernel variants through the REAL headline path.

ablate_stages.py measures the flat-kernel pipeline (color_palette_batched
on h/s/v planes); the driver bench routes tile-aligned shapes through the
rgb-native kernels instead (use_rgb_palette_path), so rgb-kernel variants
must be A/B'd on this program.  Builds the same uint8 -> full_report_batched
function bench.py measures, at both noise (tied-candidate q=8 tier) and
structured (q=1 tier) content, for each requested variant.

Usage: python tools/variant_probe.py [variants...] [--batch N]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def structured_frame(height, width):
    yg, xg = np.mgrid[0:height, 0:width].astype(np.float32)
    rch = 0.25 + 0.5 * (xg / width)
    gch = 0.25 + 0.5 * (yg / height)
    bch = 0.35 + 0.25 * np.sin(2 * np.pi * xg / 97) \
        * np.cos(2 * np.pi * yg / 61)
    for (cy, cx, rad, col) in (
            (height * 0.3, width * 0.3, 160, (0.9, 0.1, 0.1)),
            (height * 0.7, width * 0.6, 220, (0.1, 0.8, 0.2)),
            (height * 0.4, width * 0.8, 140, (0.15, 0.2, 0.9))):
        m = (yg - cy) ** 2 + (xg - cx) ** 2 < rad ** 2
        rch[m], gch[m], bch[m] = col
    photo = np.stack([rch, gch, bch], -1)
    photo += np.random.default_rng(7).normal(0, 0.01, photo.shape)
    return (np.clip(photo, 0.0, 1.0) * 255.0).round().astype(np.uint8)


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    variants = args or ["candidate", "bf16"]
    batch = 16
    for a in sys.argv[1:]:
        if a.startswith("--batch"):
            batch = int(a.split("=")[1])
    height, width = 1080, 1920

    from photohive_dsp_tpu import ReportConfig
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build_fn  # the exact driver-bench program

    cfg = ReportConfig()
    rng = np.random.default_rng(0)
    noise = jax.device_put(rng.integers(
        0, 256, (batch, height, width, 3), dtype=np.uint8))
    photo = jax.device_put(np.broadcast_to(
        structured_frame(height, width), (batch, height, width, 3)).copy())
    boxes = np.zeros((batch, 10, 4), np.int32)
    boxes[:, 0] = (100, 500, 200, 900)
    boxes[:, 1] = (400, 900, 600, 1500)
    valid = np.zeros((batch, 10), bool)
    valid[:, :2] = True
    dboxes, dvalid = jax.device_put(boxes), jax.device_put(valid)
    mp = batch * height * width / 1e6

    ref = {}
    for variant in variants:
        os.environ["PHOTOHIVE_PALETTE_KERNEL"] = variant
        t0 = time.perf_counter()
        fn = build_fn(cfg, height, width, True)
        for name, frame in (("noise", noise), ("photo", photo)):
            out = fn(frame, dboxes, dvalid)
            np.asarray(out.blur_bins)  # warm this cond branch
            ts = []
            for _ in range(8):
                t1 = time.perf_counter()
                o = fn(frame, dboxes, dvalid)
                np.asarray(o.rgb_stats)
                ts.append(time.perf_counter() - t1)
            best = min(ts)
            key = (name, "ids")
            ids = np.asarray(out.palette_ids)
            pct = np.asarray(out.palette_pct)
            if key in ref:
                same = (ref[key] == ids).all() and \
                    np.allclose(ref[(name, "pct")], pct)
                tag = "MATCH" if same else "** MISMATCH **"
            else:
                ref[key] = ids
                ref[(name, "pct")] = pct
                tag = "(ref)"
            print(f"{variant:<10} {name:<6} {best*1e3:7.1f} ms  "
                  f"{mp/best:6.1f} MP/s  {tag}", flush=True)
        print(f"  [{variant} compile+warm+measure "
              f"{time.perf_counter()-t0:.1f}s]", flush=True)


if __name__ == "__main__":
    main()
