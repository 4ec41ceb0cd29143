"""On-chip A/B of any env-gated path through the REAL headline program.

Generalizes tools/fft_ab.py: toggles one PHOTOHIVE_* env var between
builds of the exact bench program and times both at noise + structured
content (min of 8 pipelined iters, batch 16 default).  Palette ids must
match exactly across variants; blur bins within 1e-4 relative.

Usage: python tools/env_ab.py PHOTOHIVE_U8_KERNELS [--batch N]
       python tools/env_ab.py PHOTOHIVE_FFT_PALLAS --batch 32
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def main():
    var = sys.argv[1]
    batch = 16
    argv = sys.argv[1:]
    for i, a in enumerate(argv):
        if a.startswith("--batch"):
            if "=" in a:
                batch = int(a.split("=")[1])
            elif i + 1 < len(argv) and argv[i + 1].isdigit():
                batch = int(argv[i + 1])
            else:
                sys.exit("usage: --batch N or --batch=N")
    height, width = 1080, 1920

    from photohive_dsp_tpu import ReportConfig
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from bench import build_fn
    from variant_probe import structured_frame

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
    prior = os.environ.get(var)
    try:
        for setting in ("0", "1"):
            os.environ[var] = setting
            t0 = time.perf_counter()
            fn = build_fn(cfg, height, width, True)
            for name, frame in (("noise", noise), ("photo", photo)):
                out = fn(frame, dboxes, dvalid)
                np.asarray(out.blur_bins)
                ts = []
                for _ in range(8):
                    t1 = time.perf_counter()
                    o = fn(frame, dboxes, dvalid)
                    np.asarray(o.rgb_stats)
                    ts.append(time.perf_counter() - t1)
                best = min(ts)
                ids = np.asarray(out.palette_ids)
                bins = np.asarray(out.blur_bins)
                if (name, "ids") in ref:
                    same = (ref[(name, "ids")] == ids).all()
                    brel = np.abs(bins - ref[(name, "bins")]).max() \
                        / max(np.abs(ref[(name, "bins")]).max(), 1e-9)
                    tag = ("MATCH" if same else "** IDS MISMATCH **") \
                        + f" bins_rel={brel:.2e}" \
                        + ("" if brel < 1e-4 else " ** BINS OFF **")
                else:
                    ref[(name, "ids")] = ids
                    ref[(name, "bins")] = bins
                    tag = "(ref)"
                print(f"{var}={setting} {name:<6} {best*1e3:7.1f} ms  "
                      f"{mp/best:6.1f} MP/s  {tag}", flush=True)
            print(f"  [{var}={setting} total {time.perf_counter()-t0:.1f}s]",
                  flush=True)
    finally:
        # restore the caller's pre-run setting rather than clobbering it
        if prior is None:
            os.environ.pop(var, None)
        else:
            os.environ[var] = prior


if __name__ == "__main__":
    main()
