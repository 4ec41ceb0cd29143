"""On-chip A/B of the Pallas FFT path through the REAL headline program.

Same methodology as tools/variant_probe.py (min of 8 pipelined timed
iters on the exact bench program at 1080p), toggling PHOTOHIVE_FFT_PALLAS
between builds.  Blur bins are compared across variants at 1e-4 relative
(the two FFTs round differently; palette ids/pcts must match exactly).

Usage: python tools/fft_ab.py [--batch N] [on off]
       python tools/fft_ab.py coverage    (host-only eligibility census)
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")


def coverage():
    """Fraction of corpus megapixels the Pallas FFT can serve
    (eligible) AND actually serves under default routing
    (use_pallas_fft — tall strips route to XLA by measured perf)
    across the project's benchmark corpora — VERDICT r4 #3's ">=80% of
    mixed-res corpus megapixels" criterion.  Host-only: both are pure
    shape predicates."""
    from photohive_dsp_tpu.ops.pallas_fft import eligible, use_pallas_fft

    corpora = {
        # bench.py _measure_mixed_res (config #3 driver corpus)
        "bench_mixed_res": [(720, 1280), (1080, 1920), (480, 640)] * 85,
        # scaling_bench.make_corpus (configs #4/#5 synthetic corpus)
        "scaling_corpus": [(350, 350), (360, 480), (384, 512)] * 100,
        # headline + large-shape configs
        "headline_shapes": [(1080, 1920), (2160, 3840), (4320, 7680),
                            (720, 1280)],
    }
    for name, shapes in corpora.items():
        mp = sum(h * w for h, w in shapes) / 1e6
        mp_el = sum(h * w for h, w in shapes if eligible(h, w)) / 1e6
        mp_rt = sum(h * w for h, w in shapes
                    if use_pallas_fft(h, w)) / 1e6
        missing = sorted({(h, w) for h, w in shapes
                          if not eligible(h, w)})
        print(f"{name:<18} eligible {mp_el:7.1f}/{mp:7.1f} MP "
              f"({mp_el / mp * 100:5.1f}%)  routed "
              f"{mp_rt / mp * 100:5.1f}%"
              + (f"  ineligible: {missing}" if missing else ""))


def main():
    if "coverage" in sys.argv[1:]:
        coverage()
        return
    batch = 16
    for a in sys.argv[1:]:
        if a.startswith("--batch"):
            batch = int(a.split("=")[1])
    variants = [a for a in sys.argv[1:] if a in ("on", "off")] or \
        ["off", "on"]
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
    for variant in variants:
        os.environ["PHOTOHIVE_FFT_PALLAS"] = \
            "1" if variant == "on" else "0"
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
            print(f"fft={variant:<4} {name:<6} {best*1e3:7.1f} ms  "
                  f"{mp/best:6.1f} MP/s  {tag}", flush=True)
        print(f"  [fft={variant} total {time.perf_counter()-t0:.1f}s]",
              flush=True)


if __name__ == "__main__":
    main()
