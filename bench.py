"""Benchmark: full-report throughput in megapixels/s on one chip.

Prints exactly ONE JSON line on stdout (the driver contract):
  {"metric": "...", "value": N, "unit": "MP/s", "vs_baseline": N, ...}

Driver-survivability design (round-1 failure mode was rc=124, no number):
  1. *Pre-flight*: a subprocess probes the backend (import jax + tiny
     matmul) under a hard timeout.  A dead/hung backend costs at most the
     probe timeout, after which the last-good cached number is emitted
     (flagged "degraded") and we exit 0 — the driver always gets a line.
  2. *Supervised measurement*: the measurement runs in a child process the
     parent kills at the deadline (SIGALRM cannot interrupt a blocking XLA
     compile, so the deadline must be external).  On expiry/death the
     cached number is printed instead.
  3. *In-process fallback*: a Pallas compile/runtime failure rebuilds the
     jit program with the XLA path in the same child (identical reports,
     slower) instead of re-executing a fresh interpreter.
  4. On success the result is written to BENCH_LAST_GOOD.json for future
     degraded rounds.

Measures the on-device compute path: uint8 1080p batches (with crop boxes)
resident on the chip, full report pipeline per batch, iterations dispatched
pipelined with one final sync (`value`; the per-step-synced number is
reported as `synced_mps` — on this tunneled dev host each sync costs a
~35-40 ms round trip that a real TPU host does not pay).  (This dev environment reaches the TPU over
a ~1.2 GB/s network tunnel, so host->device streaming is tunnel-bound here;
on a real TPU host the PCIe link sustains the ~60 MB per uint8 batch easily
and the corpus driver overlaps uploads with compute.)

Baselines reported:
  * vs_baseline: against the reference C library's published per-stage
    timings (~1.73 s per image on a 12-core CPU => ~1.19 MP/s at 1080p;
    reference README.md:63-75, BASELINE.md).
  * roofline_frac: measured MP/s over the analytic per-chip ceiling from
    tools/roofline.py (min-HBM-traffic / VPU-op / MXU-flop model with
    microbenchmarked resource rates).  See that module for the model.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import numpy as np

REFERENCE_MPS = 2.0736 / 1.73  # 1920x1080 MP / published total seconds

REPO = os.path.dirname(os.path.abspath(__file__))
LAST_GOOD = os.path.join(REPO, "BENCH_LAST_GOOD.json")

BUDGET_S = float(os.environ.get("PHOTOHIVE_BENCH_BUDGET_S", "840"))
PROBE_TIMEOUT_S = float(os.environ.get("PHOTOHIVE_BENCH_PROBE_S", "300"))

HEIGHT, WIDTH = 1080, 1920


def _batch_for(platform: str) -> int:
    """32 x 1080p on the chip; 4 on CPU (a 32-batch CPU run would blow
    any reasonable budget at ~36 s per iteration)."""
    env = os.environ.get("PHOTOHIVE_BENCH_BATCH")
    if env:
        return int(env)
    return 4 if platform == "cpu" else 32


def emit(payload: dict) -> None:
    """The one stdout JSON line.  Everything else goes to stderr."""
    print(json.dumps(payload), flush=True)


def emit_degraded(reason: str) -> None:
    try:
        with open(LAST_GOOD) as f:
            cached = json.load(f)
        cached["degraded"] = reason
        emit(cached)
    except (OSError, ValueError):
        emit({"metric": "full_report_throughput_1080p", "value": 0.0,
              "unit": "MP/s", "vs_baseline": 0.0, "degraded": reason})


def preflight(env: dict) -> bool:
    """Probe the backend in a subprocess so a hung runtime can't eat the
    whole budget.  Returns True if a device ran a matmul."""
    code = (
        "import os, jax;"
        "jax.config.update('jax_platforms', 'cpu') "
        "if os.environ.get('JAX_PLATFORMS') == 'cpu' else None;"
        "import jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "(x @ x).block_until_ready();"
        "print('PREFLIGHT_OK', jax.devices()[0].platform)"
    )
    try:
        out = subprocess.run(
            [sys.executable, "-c", code], capture_output=True, text=True,
            timeout=PROBE_TIMEOUT_S, env=env)
    except subprocess.TimeoutExpired:
        print(f"preflight timed out after {PROBE_TIMEOUT_S:.0f}s",
              file=sys.stderr)
        return False
    ok = "PREFLIGHT_OK" in out.stdout
    if not ok:
        print(f"preflight failed rc={out.returncode}: "
              f"{out.stderr[-500:]}", file=sys.stderr)
    else:
        print(f"preflight ok: {out.stdout.strip()}", file=sys.stderr)
    return ok


def build_fn(cfg, height, width, use_pallas):
    import jax
    import jax.numpy as jnp

    from photohive_dsp_tpu.models.pipeline import (ReportTables,
                                                   full_report_batched)

    tables = ReportTables.build(height, width, cfg)

    @jax.jit
    def fn(u8, boxes, valid):
        from photohive_dsp_tpu.ops.colorspace import u8_to_unit_f32
        u8p = jnp.moveaxis(u8, -1, 1)
        rgb = u8_to_unit_f32(u8p)
        return full_report_batched(rgb, boxes, valid, tables, cfg,
                                   use_pallas, rgb_u8=u8p)

    return fn


def measure(deadline: float) -> dict:
    import jax

    from photohive_dsp_tpu import ReportConfig

    from photohive_dsp_tpu.models.batch import _want_pallas

    cfg = ReportConfig()
    platform = jax.devices()[0].platform
    batch = _batch_for(platform)
    # The shared gate: honors PHOTOHIVE_NO_PALLAS and excludes every
    # non-TPU backend (gpu/cuda/rocm/METAL), not just cpu.
    use_pallas = _want_pallas()

    rng = np.random.default_rng(0)
    frames = [
        jax.device_put(rng.integers(0, 256, (batch, HEIGHT, WIDTH, 3),
                                    dtype=np.uint8))
        for _ in range(2)
    ]
    boxes = np.zeros((batch, 10, 4), np.int32)
    boxes[:, 0] = (100, 500, 200, 900)
    boxes[:, 1] = (400, 900, 600, 1500)
    valid = np.zeros((batch, 10), bool)
    valid[:, :2] = True
    dboxes, dvalid = jax.device_put(boxes), jax.device_put(valid)

    def warm(use_pallas):
        fn = build_fn(cfg, HEIGHT, WIDTH, use_pallas)
        out = fn(frames[0], dboxes, dvalid)
        np.asarray(out.blur_bins)  # sync (NamedTuple block_until_ready
        return fn                  # was seen returning early; CLAUDE.md)

    t0 = time.perf_counter()
    try:
        fn = warm(use_pallas)
    except Exception as exc:  # noqa: BLE001 — Pallas compile/runtime
        if not use_pallas:
            raise
        print(f"pallas path failed ({type(exc).__name__}: {exc}); "
              "falling back to XLA in-process", file=sys.stderr)
        use_pallas = False
        fn = warm(False)
    compile_s = time.perf_counter() - t0
    print(f"warmup+compile {compile_s:.1f}s (pallas={use_pallas})",
          file=sys.stderr)

    # One probe iteration sizes the loop to the remaining budget.
    t0 = time.perf_counter()
    out = fn(frames[1], dboxes, dvalid)
    np.asarray(out.rgb_stats)
    iter_s = time.perf_counter() - t0
    remaining = deadline - time.perf_counter() - 10.0
    iters = int(max(3, min(16, remaining * 0.6 / max(iter_s, 1e-3))))
    print(f"probe iter {iter_s * 1e3:.1f} ms -> {iters} timed iters",
          file=sys.stderr)

    # Sustained (pipelined) throughput: dispatch every iteration, sync
    # once.  On this dev host each per-iteration sync costs a ~35-40 ms
    # network-tunnel round trip (tools/dispatch_probe.py: trivial jit
    # dispatch 33-40 ms; the fused program fits wall = 59 ms fixed +
    # 1.8 ms/MP), which a real TPU host's ~microsecond dispatch does not
    # pay.  The device executes queued steps back to back either way, so
    # the pipelined number is the chip's serving throughput; the fully
    # synced per-step number is kept alongside for transparency.
    t0 = time.perf_counter()
    outs = [fn(frames[i % 2], dboxes, dvalid) for i in range(iters)]
    np.asarray(outs[-1].rgb_stats)   # queue drains in order
    for o in outs:
        np.asarray(o.blur_bins)      # all steps complete
    dt = time.perf_counter() - t0

    sync_iters = min(4, iters)
    t0 = time.perf_counter()
    for i in range(sync_iters):
        out = fn(frames[i % 2], dboxes, dvalid)
        np.asarray(out.rgb_stats)  # sync the step
    np.asarray(out.blur_bins)
    dt_sync = time.perf_counter() - t0

    mps = batch * HEIGHT * WIDTH / 1e6 * iters / dt
    result = {
        "metric": "full_report_throughput_1080p",
        "value": round(mps, 3),
        "unit": "MP/s",
        "vs_baseline": round(mps / REFERENCE_MPS, 2),
        "platform": platform,
        "pallas": use_pallas,
        "batch": batch,
        "iters": iters,
        "synced_mps": round(batch * HEIGHT * WIDTH / 1e6 * sync_iters
                            / dt_sync, 3),
    }
    # Cache the headline number the moment it exists; every later
    # section re-caches after completing, so a stall anywhere below
    # still emits everything measured so far.
    _cache_result(result)

    # Photo-like content metric.  Uniform noise (above — kept as `value`
    # for continuity) is this pipeline's WORST case: it populates every
    # quantizer cell and forces the tied-candidate palette branch.  Real
    # photos (smooth regions + subjects) take the no-tie fast tier; the
    # reference's own published timing used a real photo (README.md:
    # 60-61).  Content: gradients + saturated blobs + mild sensor noise
    # (the test suite's structured_image recipe), q_needed == 1.
    try:
        yg, xg = np.mgrid[0:HEIGHT, 0:WIDTH].astype(np.float32)
        rch = 0.25 + 0.5 * (xg / WIDTH)
        gch = 0.25 + 0.5 * (yg / HEIGHT)
        bch = 0.35 + 0.25 * np.sin(2 * np.pi * xg / 97) \
            * np.cos(2 * np.pi * yg / 61)
        for (cy, cx, rad, col) in (
                (HEIGHT * 0.3, WIDTH * 0.3, 160, (0.9, 0.1, 0.1)),
                (HEIGHT * 0.7, WIDTH * 0.6, 220, (0.1, 0.8, 0.2)),
                (HEIGHT * 0.4, WIDTH * 0.8, 140, (0.15, 0.2, 0.9))):
            m = (yg - cy) ** 2 + (xg - cx) ** 2 < rad ** 2
            rch[m], gch[m], bch[m] = col
        photo = np.stack([rch, gch, bch], -1)
        photo += np.random.default_rng(7).normal(0, 0.01, photo.shape)
        photo = (np.clip(photo, 0.0, 1.0) * 255.0).round().astype(np.uint8)
        pframe = jax.device_put(np.broadcast_to(
            photo, (batch, HEIGHT, WIDTH, 3)).copy())
        out = fn(pframe, dboxes, dvalid)
        np.asarray(out.blur_bins)  # warm (cond branch may compile here)
        s_iters = max(3, iters // 2)
        t0 = time.perf_counter()
        souts = [fn(pframe, dboxes, dvalid) for _ in range(s_iters)]
        for o in souts:
            np.asarray(o.blur_bins)
        s_mps = batch * HEIGHT * WIDTH / 1e6 * s_iters \
            / (time.perf_counter() - t0)
        result["structured_1080p_mps"] = round(s_mps, 3)
        print(f"structured-content: {s_mps:.2f} MP/s", file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 — never lose the number
        print(f"structured metric skipped: {type(exc).__name__}: {exc}",
              file=sys.stderr)

    # Marginal (dispatch-overhead-free) throughput: the tunnel serializes
    # dispatches (queued iterations measure the same as synced ones), so
    # the chip's true sustained rate only shows in the batch-size slope:
    # marginal = d(MP)/d(wall) between the batch and batch/2 programs.
    # This is what a real TPU host (with ~us dispatch) would sustain.
    try:
        half = batch // 2
        fnh = build_fn(cfg, HEIGHT, WIDTH, use_pallas)
        hframe = frames[0][:half]
        out = fnh(hframe, dboxes[:half], dvalid[:half])
        np.asarray(out.blur_bins)  # compile+warm

        def best_of(f, fr, bx, vl, n=8):
            best = float("inf")
            for _ in range(n):
                t0 = time.perf_counter()
                o = f(fr, bx, vl)
                np.asarray(o.rgb_stats)
                best = min(best, time.perf_counter() - t0)
            return best

        t_full = best_of(fn, frames[1], dboxes, dvalid)
        t_half = best_of(fnh, hframe, dboxes[:half], dvalid[:half])
        if t_full > t_half:
            marg = (batch - half) * HEIGHT * WIDTH / 1e6 \
                / (t_full - t_half)
            result["marginal_mps"] = round(marg, 1)
            print(f"marginal (batch {half}->{batch}): {marg:.1f} MP/s",
                  file=sys.stderr)
        # Same slope on photo-like content (the q=1 palette tier the
        # reference's own published benchmark exercised): the pipelined
        # structured number swings with the tunnel; this is the chip's
        # rate.  Reuses the compiled executables and pframe from above.
        if "pframe" in dir():
            ts_full = best_of(fn, pframe, dboxes, dvalid)
            ts_half = best_of(fnh, pframe[:half], dboxes[:half],
                              dvalid[:half])
            if ts_full > ts_half:
                smarg = (batch - half) * HEIGHT * WIDTH / 1e6 \
                    / (ts_full - ts_half)
                result["marginal_structured_mps"] = round(smarg, 1)
                print(f"marginal structured: {smarg:.1f} MP/s",
                      file=sys.stderr)
    except Exception as exc:  # noqa: BLE001 — never lose the number
        print(f"marginal metric skipped: {type(exc).__name__}: {exc}",
              file=sys.stderr)

    # Re-cache with the structured metric before the roofline add-on:
    # its microbenchmarks compile fresh executables, and a tunnel stall
    # there must not lose anything measured above.
    _cache_result(result)

    # Roofline accounting (cheap; skipped if the deadline is close).
    if deadline - time.perf_counter() > 30.0:
        try:
            from tools.roofline import roofline_report
            roof = roofline_report(HEIGHT, WIDTH, measure_rates=True)
            result["roofline_mps"] = round(roof["roofline_mps"], 1)
            result["roofline_frac"] = round(mps / roof["roofline_mps"], 4)
            result["roofline_bound"] = roof["bound"]
            # Parity-constrained ceiling (tools/roofline.py derivation):
            # fraction uses the least-dispatch-polluted throughput we
            # have — the marginal rate when measured, else the headline.
            par = roof.get("roofline_parity_mps")
            if par:
                # The frac's numerator is the least-dispatch-polluted
                # throughput available; NAME it in the same line so 0.42
                # can't be misread as the headline's fraction (VERDICT r4).
                num_name = ("marginal_mps" if "marginal_mps" in result
                            else "value")
                num = result.get("marginal_mps", mps)
                result["roofline_parity_mps"] = round(par, 1)
                result["roofline_parity_frac"] = round(num / par, 4)
                result["roofline_parity_frac_of"] = num_name
                # Implementation-independent pinned anchor (v1 = 3830
                # MP/s, tools/roofline.py PINNED_CEILING_MPS): the
                # reported target fraction, immune to ceiling drift.
                pin = roof.get("pinned_ceiling_mps")
                if pin:
                    result["frac_vs_pinned"] = round(num / pin, 4)
                    result["pinned_ceiling_mps"] = pin
            print("roofline:", json.dumps(roof), file=sys.stderr)
        except Exception as exc:  # noqa: BLE001 — never lose the number
            print(f"roofline skipped: {type(exc).__name__}: {exc}",
                  file=sys.stderr)

    # Add-on budgets: each section may need a fresh compile, which on
    # the tunneled TPU can stall minutes (CLAUDE.md).  The main metric
    # is cached above (and re-cached after each completed add-on), so a
    # deadline kill mid-add-on still emits everything measured so far —
    # the margin only controls how eagerly add-ons are attempted.
    addon_margin = 90.0 if platform == "cpu" else 300.0

    # BASELINE config #2: single-4K blur-profile chain (DC removal ->
    # 2-D rFFT magnitude^2 -> log normalize -> polar bins).  Reference
    # stage total 0.572 s at ~2 MP (README.md:73); this measures the
    # full chain per 4K image on-chip.
    if deadline - time.perf_counter() > addon_margin:
        try:
            result.update(_measure_blur_4k(use_pallas, platform))
        except Exception as exc:  # noqa: BLE001 — never lose the number
            print(f"4k blur bench skipped: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
        _cache_result(result)

    # Config #3 as a CHIP number (VERDICT r4): device-resident mixed-res
    # buckets, marginal-style batch slope per bucket — no host link, no
    # decode, no dispatch floor in the metric.  Runs BEFORE the
    # tunnel-bound end-to-end section, which can eat the whole remaining
    # budget when the link is degraded (observed: 132 s for 282 MP).
    if platform != "cpu" and deadline - time.perf_counter() > addon_margin:
        try:
            result.update(_measure_mixed_res_device(cfg, use_pallas))
        except Exception as exc:  # noqa: BLE001 — never lose the number
            print(f"mixed-res device bench skipped: "
                  f"{type(exc).__name__}: {exc}", file=sys.stderr)
        _cache_result(result)

    # BASELINE config #3 end to end: mixed-resolution corpus batch
    # through the bucketed runner (decode-free: synthetic frames;
    # measures shape bucketing + padded batching + per-bucket
    # executables, host link included).  Last section: attempt with a
    # slimmer margin — everything above is already cached, so a
    # deadline kill here loses nothing.
    if deadline - time.perf_counter() > min(addon_margin, 150.0):
        try:
            result.update(_measure_host_link())
        except Exception as exc:  # noqa: BLE001 — never lose the number
            print(f"link probe skipped: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
        try:
            result.update(_measure_mixed_res(platform))
            # Attribute the end-to-end figure's tunnel share: uploads are
            # 3 B/px, so time-in-link / wall = 3 * mps / link_MBps.
            if "host_link_mbs" in result and "mixed_res_mps" in result:
                result["mixed_res_tunnel_frac"] = round(min(
                    3.0 * result["mixed_res_mps"]
                    / max(result["host_link_mbs"], 1e-9), 1.0), 3)
        except Exception as exc:  # noqa: BLE001 — never lose the number
            print(f"mixed-res bench skipped: {type(exc).__name__}: {exc}",
                  file=sys.stderr)
        _cache_result(result)
    return result


def _measure_host_link() -> dict:
    """Host->device transfer rate (one 32 MB uint8 put).  The streaming
    metrics below are bound by this on tunneled dev hosts — nominal
    ~1.2 GB/s here, but observed sagging to 16-45 MB/s for minutes at a
    time — so the link rate is reported alongside to make degraded
    corpus numbers attributable (a real TPU host's PCIe sustains GB/s)."""
    import jax

    buf = np.zeros((32 * 1024 * 1024,), np.uint8)
    jax.device_put(buf[:1024]).block_until_ready()  # path warm-up
    t0 = time.perf_counter()
    jax.device_put(buf).block_until_ready()
    dt = time.perf_counter() - t0
    return {"host_link_mbs": round(buf.nbytes / 1e6 / dt, 1)}


def _measure_mixed_res(platform: str) -> dict:
    """Config #3 at driver scale: images over three resolutions with
    crop boxes via models.batch.run_corpus; reports aggregate MP/s."""
    from photohive_dsp_tpu import ReportConfig
    from photohive_dsp_tpu.models.batch import run_corpus

    shapes = [(720, 1280), (1080, 1920), (480, 640)]
    n = 48 if platform == "cpu" else 256
    rng = np.random.default_rng(3)
    imgs = []
    for i in range(n):
        h, w = shapes[i % len(shapes)]
        imgs.append((i, rng.integers(0, 256, (h, w, 3), np.uint8)))
    total_mp = sum(im.shape[0] * im.shape[1] for _, im in imgs) / 1e6
    cfg = ReportConfig()
    # Untimed warm pass compiles the per-shape executables (persistent-
    # cached across runs): one batch per shape suffices — a full-corpus
    # warm pass doubled the section's tunnel time for nothing.
    sum(1 for _ in run_corpus(iter(imgs[:3 * 16]), cfg, batch_size=16))
    t0 = time.perf_counter()
    done = sum(1 for _ in run_corpus(iter(imgs), cfg, batch_size=16))
    dt = time.perf_counter() - t0
    assert done == n
    mps = total_mp / dt
    print(f"mixed-res: {n} images, {total_mp:.0f} MP in {dt:.1f}s = "
          f"{mps:.2f} MP/s", file=sys.stderr)
    return {"mixed_res_mps": round(mps, 3), "mixed_res_images": n}


def _measure_mixed_res_device(cfg, use_pallas: bool) -> dict:
    """Config #3 as a chip-compute number: per-bucket batch-slope
    (marginal) rates on device-resident frames, aggregated as the
    harmonic (time-weighted) throughput of an equal-image-count mixed
    corpus.  The end-to-end mixed_res_mps includes host decode + the
    tunnel; this is what the chip itself sustains per bucket."""
    import jax

    shapes = [(720, 1280), (1080, 1920), (480, 640)]
    rng = np.random.default_rng(5)
    boxes = np.zeros((32, 10, 4), np.int32)
    boxes[:, 0] = (50, 300, 60, 400)
    valid = np.zeros((32, 10), bool)
    valid[:, 0] = True
    dboxes_a, dvalid_a = jax.device_put(boxes), jax.device_put(valid)

    def best_of(f, fr, bx, vl, n=6):
        best = float("inf")
        for _ in range(n):
            t0 = time.perf_counter()
            o = f(fr, bx, vl)
            np.asarray(o.rgb_stats)
            best = min(best, time.perf_counter() - t0)
        return best

    per_bucket = {}
    t_mixed_per_img = 0.0
    mp_per_img = 0.0
    for h, w in shapes:
        # small buckets need a bigger batch for the slope to clear the
        # ~ms-scale dispatch jitter (480x640 at 16/8 was intermittently
        # unresolvable)
        full = 16 if h * w > 1.5e6 else 32
        half = full // 2
        dboxes, dvalid = dboxes_a[:full], dvalid_a[:full]
        fn = build_fn(cfg, h, w, use_pallas)
        frame = jax.device_put(rng.integers(0, 256, (full, h, w, 3),
                                            dtype=np.uint8))
        out = fn(frame, dboxes, dvalid)
        np.asarray(out.blur_bins)  # compile+warm
        fnh = build_fn(cfg, h, w, use_pallas)
        outh = fnh(frame[:half], dboxes[:half], dvalid[:half])
        np.asarray(outh.blur_bins)
        t_full = best_of(fn, frame, dboxes, dvalid)
        t_half = best_of(fnh, frame[:half], dboxes[:half], dvalid[:half])
        if t_full <= t_half:
            print(f"mixed-res device {h}x{w}: slope not resolvable "
                  f"(t_full {t_full*1e3:.1f} <= t_half {t_half*1e3:.1f} ms)",
                  file=sys.stderr)
            continue
        mp = (full - half) * h * w / 1e6
        rate = mp / (t_full - t_half)
        per_bucket[f"{h}x{w}"] = round(rate, 1)
        t_mixed_per_img += (t_full - t_half) / (full - half)
        mp_per_img += h * w / 1e6
    if not per_bucket:
        return {}
    agg = mp_per_img / t_mixed_per_img
    print(f"mixed-res device marginal: {per_bucket} -> {agg:.1f} MP/s "
          "aggregate", file=sys.stderr)
    return {"mixed_res_device_mps": round(agg, 1),
            "mixed_res_device_buckets": per_bucket}


def _measure_blur_4k(use_pallas: bool, platform: str) -> dict:
    """Blur-profile chain on 2160x3840 grayscale: ms/image and MP/s.

    Exercises the large-shape polar path (the 4K gather table is over
    the memory budget, so the XLA route reduces through flat bin ids;
    the Pallas route always did — see ops/blur.py audit)."""
    import jax
    import jax.numpy as jnp

    from photohive_dsp_tpu import ReportConfig
    from photohive_dsp_tpu.ops.blur import (PolarTables,
                                            blur_profile_bins_batched)
    from photohive_dsp_tpu.ops.fft import magnitude_fft_normalized

    cfg = ReportConfig()
    h4, w4 = 2160, 3840
    batch = 1 if platform == "cpu" else 4

    from photohive_dsp_tpu.ops import pallas_fft
    if use_pallas and pallas_fft.use_pallas_fft(h4, w4):
        # the route the full report takes at 4K: Pallas 2-D FFT fused
        # with the log-normalize + local polar kernel
        plan = pallas_fft.FftPlan.for_shape(h4, w4)
        stab = pallas_fft.scrambled_polar_tables(h4, w4, cfg)

        @jax.jit
        def chain(pgm):
            dc = jnp.mean(pgm, axis=(1, 2), keepdims=True)
            return pallas_fft.blur_bins_scrambled_lognorm(
                pgm - dc, plan, stab, cfg.angle_partitions,
                cfg.radius_partitions)
    else:
        tables = PolarTables.for_shape(h4, w4, cfg)

        @jax.jit
        def chain(pgm):
            dc = jnp.mean(pgm, axis=(1, 2), keepdims=True)
            mag = jax.vmap(magnitude_fft_normalized)(pgm - dc)
            return blur_profile_bins_batched(mag, tables,
                                             cfg.angle_partitions,
                                             cfg.radius_partitions,
                                             use_pallas)

    rng = np.random.default_rng(1)
    frames = [jax.device_put(rng.random((batch, h4, w4), np.float32))
              for _ in range(2)]
    np.asarray(chain(frames[0]))  # warm
    t0 = time.perf_counter()
    iters = 2 if platform == "cpu" else 6
    outs = [chain(frames[i % 2]) for i in range(iters)]  # pipelined
    for out in outs:
        np.asarray(out)
    dt = time.perf_counter() - t0
    ms = dt / (iters * batch) * 1e3
    print(f"4k blur chain: {ms:.1f} ms/image (batch {batch})",
          file=sys.stderr)
    return {"blur_4k_ms": round(ms, 2),
            "blur_4k_mps": round(h4 * w4 / 1e6 / (ms / 1e3), 1)}


def _cache_result(result: dict) -> None:
    """Write the degraded-path fallback number.  Only chip results: a CPU
    measurement cached here would later masquerade as "last good"."""
    if os.environ.get("PHOTOHIVE_BENCH_NO_CACHE") \
            or result.get("platform") == "cpu" \
            or result.get("degraded"):
        return
    try:
        with open(LAST_GOOD, "w") as f:
            json.dump(result, f)
    except OSError:
        pass


def child_main() -> None:
    """Runs in the supervised child: measure + print the JSON line."""
    deadline = time.perf_counter() + \
        float(os.environ.get("PHOTOHIVE_BENCH_CHILD_S", BUDGET_S))
    try:
        result = measure(deadline)
    except Exception as exc:  # noqa: BLE001
        print(f"measurement failed: {type(exc).__name__}: {exc}",
              file=sys.stderr)
        sys.exit(3)
    _cache_result(result)  # refresh with roofline fields included
    emit(result)


def main() -> None:
    start = time.perf_counter()
    deadline = start + BUDGET_S

    env = dict(os.environ)
    degraded_note = None
    if not preflight(env):
        if env.get("JAX_PLATFORMS") == "cpu":
            emit_degraded("backend preflight failed/timed out")
            return
        # TPU dead/hung: a real CPU measurement beats a zero.  Smaller
        # batch — CPU is ~100x slower per 1080p frame than the chip.
        print("falling back to a CPU measurement", file=sys.stderr)
        env["JAX_PLATFORMS"] = "cpu"
        env.setdefault("PHOTOHIVE_BENCH_BATCH", "4")
        env["PHOTOHIVE_BENCH_NO_CACHE"] = "1"  # don't shadow a TPU number
        degraded_note = "tpu unreachable; measured on cpu fallback"
        if not preflight(env):
            emit_degraded("backend preflight failed/timed out (tpu and cpu)")
            return

    remaining = deadline - time.perf_counter() - 5.0
    env["PHOTOHIVE_BENCH_CHILD_S"] = str(remaining)
    run_start = time.time()
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--measure"],
            capture_output=True, text=True, timeout=remaining, env=env)
    except subprocess.TimeoutExpired as exc:
        sys.stderr.write((exc.stderr or b"").decode("utf-8", "replace")
                         if isinstance(exc.stderr, bytes)
                         else (exc.stderr or ""))
        # The child caches after every completed section, so a deadline
        # kill mid-ADD-ON leaves THIS RUN's fresh numbers in the cache.
        # Those are a valid measurement (just missing later add-ons) —
        # emit them as "partial", which the floor gate accepts; only a
        # cache older than this run is truly degraded (self-review r5).
        try:
            if os.path.getmtime(LAST_GOOD) >= run_start:
                with open(LAST_GOOD) as f:
                    fresh = json.load(f)
                fresh["partial"] = "deadline hit during add-ons"
                emit(fresh)
                return
        except (OSError, ValueError):
            pass
        emit_degraded("deadline expired mid-measurement")
        return
    sys.stderr.write(out.stderr)
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if out.returncode == 0 and lines:
        result = json.loads(lines[-1])
        if degraded_note:
            result["degraded"] = degraded_note
        emit(result)
    else:
        emit_degraded(f"measurement child failed rc={out.returncode}")


if __name__ == "__main__":
    sys.path.insert(0, REPO)
    if "--measure" in sys.argv:
        child_main()
    else:
        main()
