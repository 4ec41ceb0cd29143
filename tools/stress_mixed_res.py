"""Mixed-resolution batch stress (BASELINE.json config #3): 256 images
across several resolutions with crop boxes, one chip, via the bucketed
corpus runner.  Prints per-bucket and total throughput."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    from photohive_dsp_tpu import ReportConfig
    from photohive_dsp_tpu.models.batch import run_corpus

    shapes = [(720, 1280), (1080, 1920), (480, 640)]
    n_images = 256
    rng = np.random.default_rng(0)
    total_mp = 0.0

    order = sys.argv[1] if len(sys.argv) > 1 else "interleaved"

    def images():
        nonlocal total_mp
        idxs = list(range(n_images))
        if order == "grouped":
            idxs.sort(key=lambda i: i % len(shapes))
        for i in idxs:
            h, w = shapes[i % len(shapes)]
            total_mp += h * w / 1e6
            yield i, rng.integers(0, 256, (h, w, 3), dtype=np.uint8)

    cfg = ReportConfig()
    # warm the (shape, batch_size) executables
    def warm_images():
        for h, w in shapes:
            yield (h, w), rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
    warm = list(run_corpus(warm_images(), cfg, batch_size=32))
    assert len(warm) == len(shapes)

    t0 = time.perf_counter()
    n = sum(1 for _ in run_corpus(images(), cfg, batch_size=32))
    dt = time.perf_counter() - t0
    assert n == n_images
    print(f"mixed-res stress: {n} images, {total_mp:.0f} MP in {dt:.1f}s "
          f"= {total_mp / dt:.1f} MP/s ({n / dt:.1f} img/s)")


if __name__ == "__main__":
    main()
