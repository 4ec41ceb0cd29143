"""Fused-program stage ablation: the only trustworthy stage costing here.

Isolated per-stage timings on this host are polluted by ~30-50 ms of
per-dispatch overhead when alternating executables (see CLAUDE.md), and the
fused report overlaps stages, so stage costs must be measured as *deltas of
the fused program*: compile the full batched report with one stage replaced
by a shape-compatible dummy and compare wall-clock.

Usage: python tools/ablate_stages.py [height width batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # sitecustomize pins the axon TPU plugin; forcing CPU needs both the env
    # var and the config update (see CLAUDE.md / tests/conftest.py).
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def build_variant(skip: frozenset, cfg, tables, use_pallas: bool):
    """full_report_batched with the named stages dummied out."""
    from photohive_dsp_tpu.models.pipeline import ReportData
    from photohive_dsp_tpu.ops.blur import (blur_profile_bins_batched,
                                            vectorize_blur_profile)
    from photohive_dsp_tpu.ops.colorspace import (downsample_rgb, rgb_to_hsv,
                                                  rgb_to_pgm)
    from photohive_dsp_tpu.ops.fft import magnitude_fft_normalized
    from photohive_dsp_tpu.ops.quantize import color_palette_batched
    from photohive_dsp_tpu.ops.sharpness import variance_sharpness_batched
    from photohive_dsp_tpu.ops.stats import mean_saturation, rgb_statistics

    def fn(rgb, boxes, boxes_valid):
        b = rgb.shape[0]
        c = cfg.num_cells
        a_bins, r_bins = cfg.angle_partitions, cfg.radius_partitions

        down = jax.vmap(lambda x: downsample_rgb(x, cfg.downsample_rate))(rgb)
        if "hsv" in skip:
            # Constant planes: removes the hsv branch math AND the rgb
            # read; the palette kernels read (materialized) broadcasts, so
            # their input marshalling cost stays in the measurement.
            h = jnp.full(down.shape[0:1] + down.shape[2:], 123.4, jnp.float32)
            s = jnp.full_like(h, 0.5)
            v = jnp.full_like(h, 0.5)
        else:
            h, s, v = jax.vmap(lambda x: rgb_to_hsv(x[0], x[1], x[2]))(down)
        pgm = jax.vmap(lambda x: rgb_to_pgm(x[0], x[1], x[2]))(rgb)
        if "stats" in skip:
            # 128-px sample keeps the data dependence, drops the full-res
            # two-pass mean/var reads.
            stats = jnp.mean(rgb[:, :, :4, :32], axis=(2, 3))
            stats = jnp.concatenate([stats, stats], axis=1)
        else:
            stats = jax.vmap(lambda x: rgb_statistics(x[0], x[1], x[2]))(rgb)
        if "sbar" in skip:
            s_bar = jnp.mean(s[:, :4, :32], axis=(1, 2))
        else:
            s_bar = jax.vmap(mean_saturation)(s)

        if "palette" in skip:
            ph = jnp.zeros((b, c, 3)) + s_bar[:, None, None]
            pp = jnp.zeros((b, c))
            pn = jnp.zeros((b,), jnp.int32)
            pids = jnp.zeros((b, c), jnp.int32)
        else:
            pal = color_palette_batched(h, s, v, cfg, tables.octree,
                                        use_pallas)
            ph, pp, pn, pids = (pal.hsv, pal.percentages, pal.n_valid,
                                pal.parent_ids)

        if "sharpness" in skip:
            sharp = jnp.zeros((b, boxes.shape[1])) + s_bar[:, None]
        else:
            # The production batched formulation (shared Laplacian + ring
            # corrections) — the per-box masked path overstated this
            # stage's delta ~3x.
            sharp = variance_sharpness_batched(pgm, boxes, boxes_valid)

        dc = (stats[:, 0] + stats[:, 1] + stats[:, 2]) / 3.0
        if "fft" in skip:
            fw = rgb.shape[3] // 2 + 1
            mag = (pgm[:, :, :fw] - dc[:, None, None])
        else:
            mag = jax.vmap(magnitude_fft_normalized)(pgm - dc[:, None, None])

        if "polar" in skip:
            bins = jnp.mean(mag, axis=(1, 2))[:, None, None] \
                + jnp.zeros((b, a_bins, r_bins))
        else:
            bins = blur_profile_bins_batched(mag, tables.polar, a_bins,
                                             r_bins, use_pallas)

        if "vectors" in skip:
            angles = jnp.zeros((b, 10), jnp.int32)
            mags = bins[:, :10, 0]
        else:
            angles, mags = jax.vmap(
                lambda bb: vectorize_blur_profile(bb, cfg))(bins)

        return ReportData(
            rgb_stats=stats, average_saturation=s_bar, palette_hsv=ph,
            palette_pct=pp, palette_n=pn, palette_ids=pids, sharpness=sharp,
            blur_bins=bins, blur_vector_angles=angles, blur_vector_mags=mags)

    return jax.jit(fn)


def main():
    from photohive_dsp_tpu.config import ReportConfig
    from photohive_dsp_tpu.models.pipeline import ReportTables

    # Internal budget (seconds): stop cleanly between measurements rather
    # than letting an external timeout kill the table mid-row (round-4's
    # ablate step truncated at rc=124, leaving a partly-noise table).
    budget = float(os.environ.get("PHOTOHIVE_ABLATE_BUDGET_S", "1e9"))
    t_start = time.perf_counter()

    def over_budget(section: str) -> bool:
        if time.perf_counter() - t_start > budget:
            print(f"  [budget {budget:.0f}s exhausted; skipping {section} "
                  "— rerun with PHOTOHIVE_ABLATE_STAGES to finish]",
                  flush=True)
            return True
        return False

    height, width, batch = 1080, 1920, 16
    if len(sys.argv) >= 4:
        height, width, batch = map(int, sys.argv[1:4])
    cfg = ReportConfig()
    tables = ReportTables.build(height, width, cfg)
    from photohive_dsp_tpu.models.batch import _want_pallas
    use_pallas = _want_pallas()  # honors PHOTOHIVE_NO_PALLAS + backend

    rng = np.random.default_rng(0)
    rgb = jax.device_put(rng.random((batch, 3, height, width),
                                    np.float32).astype(np.float32))
    boxes = np.zeros((batch, 10, 4), np.int32)
    boxes[:, 0] = (100, 500, 200, 900)
    boxes[:, 1] = (400, 900, 600, 1500)
    valid = np.zeros((batch, 10), bool)
    valid[:, :2] = True
    dboxes, dvalid = jax.device_put(boxes), jax.device_put(valid)

    def measure(skip):
        fn = build_variant(frozenset(skip), cfg, tables, use_pallas)
        out = fn(rgb, dboxes, dvalid)
        np.asarray(out.rgb_stats)  # compile+run
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            out = fn(rgb, dboxes, dvalid)
            np.asarray(out.rgb_stats)
            # whole-leaf transfer: slicing would dispatch a second tiny
            # executable per rep (30-50 ms alternation cost, CLAUDE.md)
            np.asarray(out.blur_bins)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    base = measure(())
    mp = batch * height * width / 1e6
    print(f"full fused: {base*1000:.1f} ms  ({mp/base:.1f} MP/s)")
    stages = ("palette", "sharpness", "fft", "polar", "vectors",
              "hsv", "stats", "sbar")
    if os.environ.get("PHOTOHIVE_ABLATE_STAGES"):
        stages = tuple(os.environ["PHOTOHIVE_ABLATE_STAGES"].split(","))
    for stage in stages:
        if over_budget(f"-{stage} and later sections"):
            return
        t = measure((stage,))
        print(f"  -{stage:<10} {t*1000:7.1f} ms   delta {1000*(base-t):+7.1f} ms")

    if use_pallas and not over_budget("kernel A/B"):
        # Palette-kernel A/B: same fused program under each variant (the
        # env switch is read at trace time in palette_sums_by_k_auto).
        from photohive_dsp_tpu.ops.quantize import palette_kernel_variant
        print(f"palette kernel A/B (full fused program; baseline above "
              f"used '{palette_kernel_variant()}'):")
        orig = os.environ.get("PHOTOHIVE_PALETTE_KERNEL")
        try:
            for variant in ("candidate", "bf16", "cwide"):
                if over_budget(f"kernel A/B '{variant}'"):
                    break
                os.environ["PHOTOHIVE_PALETTE_KERNEL"] = variant
                t = measure(())
                print(f"  {variant:<10} {t*1000:7.1f} ms  ({mp/t:.1f} MP/s)")
        finally:
            if orig is None:
                os.environ.pop("PHOTOHIVE_PALETTE_KERNEL", None)
            else:
                os.environ["PHOTOHIVE_PALETTE_KERNEL"] = orig

    if not over_budget("polar route A/B"):
        polar_route_ab(height, width, batch, cfg)


def polar_route_ab(height, width, batch, cfg):
    """Gather-table vs flat-ids polar reduction on the XLA path.

    Grounds the _pad_table_budget() routing empirically (ops/blur.py
    audit): the Pallas TPU path always uses flat ids, so this A/B is
    about the PHOTOHIVE_NO_PALLAS fallback (and host backends, where the
    measured gap was ~70x in favor of the gather at 4K on CPU).  Runs
    the isolated blur chain — dc removal -> rfft2 mag^2 -> log normalize
    -> polar bins — under each route; deltas of one program, so the
    alternation overhead (CLAUDE.md) applies equally to both."""
    from photohive_dsp_tpu.ops.blur import (PolarTables,
                                            blur_profile_bins_batched)
    from photohive_dsp_tpu.ops.fft import magnitude_fft_normalized

    rng = np.random.default_rng(3)
    pgm = jax.device_put(rng.random((batch, height, width), np.float32))
    print(f"polar route A/B (XLA blur chain, {batch}x{height}x{width}):")
    for route, budget in (("gather", 1 << 62), ("flat", 0)):
        tables = PolarTables.for_shape(height, width, cfg,
                                       max_table_bytes=budget)
        tbytes = 0 if tables.pad_index is None else tables.pad_index.size * 4
        fn = jax.jit(lambda p, t: blur_profile_bins_batched(
            jax.vmap(magnitude_fft_normalized)(
                p - jnp.mean(p, axis=(1, 2), keepdims=True)),
            t, cfg.angle_partitions, cfg.radius_partitions,
            use_pallas=False))
        np.asarray(fn(pgm, tables))  # compile+run
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(fn(pgm, tables))
            ts.append(time.perf_counter() - t0)
        t = min(ts)
        print(f"  {route:<7} {t*1000:7.1f} ms  "
              f"({batch*height*width/1e6/t:6.1f} MP/s, table "
              f"{tbytes/1e6:.1f} MB)")


if __name__ == "__main__":
    main()
