"""TPU-hardware parity check for the Pallas kernels.

The CPU CI backend can't execute Mosaic kernels, so this script (run on a
real chip: ``python tools/tpu_parity_check.py``) validates the Pallas fast
path against the XLA reference path on-device:

  * margin_sort vs margin_insertion_argsort (exact),
  * cell_counts_batched vs cell_counts (exact),
  * polar_bin_sums vs float64 bincount (SNR),
  * color_palette_batched use_pallas=True vs False (ids/pct exact, hsv SNR),
  * full_report_batched Pallas vs XLA end to end.

Exit code 0 = all checks pass.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp


def main() -> int:
    from photohive_dsp_tpu.config import ReportConfig
    from photohive_dsp_tpu.models.pipeline import (ReportTables,
                                                   full_report_batched)
    from photohive_dsp_tpu.ops import pallas_kernels as pk
    from photohive_dsp_tpu.ops import quantize
    from photohive_dsp_tpu.ops.geometry import polar_geometry

    if jax.default_backend() == "cpu":
        print("SKIP: needs TPU hardware")
        return 0

    cfg = ReportConfig()
    tables = quantize.OctreeTables.for_config(cfg)
    rng = np.random.default_rng(0)
    ok = True

    def check(name, cond):
        nonlocal ok
        print(f"{'PASS' if cond else 'FAIL'}: {name}")
        ok = ok and cond

    # margin sort (including near-tie patterns)
    sal = jnp.asarray(
        np.round(rng.random((16, cfg.num_cells)) * 30)
        + rng.random((16, cfg.num_cells)) * 0.6, jnp.float32)
    ref = jax.jit(jax.vmap(quantize.margin_insertion_argsort))(sal)
    got = jax.jit(pk.margin_sort)(sal)
    check("margin_sort exact", bool((np.asarray(ref) == np.asarray(got)).all()))

    # cell counts
    cells = jnp.asarray(rng.integers(0, cfg.num_cells, (4, 123457)),
                        jnp.int32)
    refc = jax.jit(jax.vmap(
        lambda c: quantize.cell_counts(c, cfg.num_cells)))(cells)
    gotc = jax.jit(lambda c: pk.cell_counts_batched(c, cfg.num_cells))(cells)
    check("cell_counts exact",
          bool((np.asarray(refc) == np.asarray(gotc)).all()))

    # hsv-input histogram (in-kernel cell assignment): the counts source
    # of the Pallas palette path.  Checked against XLA assign_cells on
    # boundary-snapped pixels — this is the Mosaic-vs-XLA divide/clip
    # lowering check the advisor called out; a mismatch here means the
    # Pallas path stays internally consistent but its cell boundaries
    # differ from the XLA/golden path.
    hh = jnp.asarray(rng.random((4, 123457)) * 360, jnp.float32)
    ss = jnp.asarray(rng.random((4, 123457)) * 0.999, jnp.float32)
    vv = jnp.asarray(rng.random((4, 123457)) * 0.999, jnp.float32)
    ss = ss.at[:, :3000].set(jnp.float32(cfg.gray_thresh))
    vv = vv.at[:, 3000:6000].set(jnp.float32(cfg.black_thresh))
    hh = hh.at[:, 6000:9000].set(jnp.float32(cfg.cell_Lh) * 3)
    gothsv = jax.jit(lambda *a: pk.cell_counts_from_hsv(*a, cfg))(hh, ss, vv)
    refhsv = jax.jit(jax.vmap(lambda a, b2, c2: quantize.cell_counts(
        quantize.assign_cells(a, b2, c2, cfg), cfg.num_cells)))(hh, ss, vv)
    check("cell_counts_from_hsv exact (boundary pixels)",
          bool((np.asarray(gothsv) == np.asarray(refhsv)).all()))

    # rgb-native kernels (in-kernel HSV): the Mosaic hsv lowering must
    # agree with XLA rgb_to_hsv on every pixel for the counts to match
    # exactly — u8-quantized values like the real ingest path, plus
    # channel-tie pixels (r==g etc), gray/black threshold neighborhoods.
    rgbq = jnp.asarray(
        rng.integers(0, 256, (2, 3, 480, 640)).astype(np.float32) / 255.0)
    rgbq = rgbq.at[:, 1, :40].set(rgbq[:, 0, :40])      # r==g ties
    rgbq = rgbq.at[:, :, 40:80].set(rgbq[:, :1, 40:80])  # gray pixels
    rgbq = rgbq.at[:, :, 80:120].set(0.005)              # near black_thresh
    from photohive_dsp_tpu.ops.colorspace import rgb_to_hsv
    hq, sq, vq = jax.vmap(lambda x: rgb_to_hsv(x[0], x[1], x[2]))(rgbq)
    cntk, s_sum = jax.jit(lambda x: pk.cell_counts_s_from_rgb(x, cfg))(rgbq)
    cntx = jax.vmap(lambda a, b2, c2: quantize.cell_counts(
        quantize.assign_cells(a, b2, c2, cfg), cfg.num_cells))(hq, sq, vq)
    check("rgb-kernel counts exact (in-kernel hsv vs XLA)",
          bool((np.asarray(cntk) == np.asarray(cntx)).all()))
    s_ref = np.asarray(jnp.sum(sq, axis=(1, 2)))
    check("rgb-kernel saturation sum close", bool(
        np.abs(np.asarray(s_sum) - s_ref).max() < 1e-6 * s_ref.max()))
    palr, _ = jax.jit(lambda x: quantize.color_palette_batched_from_rgb(
        x, cfg, tables))(rgbq)
    palx = jax.jit(lambda *a: quantize.color_palette_batched(
        *a, cfg, tables, False))(hq, sq, vq)
    check("rgb-kernel palette ids exact", bool(
        (np.asarray(palr.parent_ids) == np.asarray(palx.parent_ids)).all()))
    check("rgb-kernel palette pct exact", bool(np.abs(
        np.asarray(palr.percentages) - np.asarray(palx.percentages)
    ).max() == 0.0))

    # PHOTOHIVE_SUMS_I8 digit-plane sums variant on silicon: interpret
    # mode cannot see a Mosaic-only miscompile of the f32->int8 casts or
    # the int8 MXU contraction, so the flag's ids/pct exactness and hsv
    # closeness are gated here (self-review r5).
    old_i8 = os.environ.get("PHOTOHIVE_SUMS_I8")
    try:
        os.environ["PHOTOHIVE_SUMS_I8"] = "1"
        pali, _ = jax.jit(
            lambda x: quantize.color_palette_batched_from_rgb(
                x, cfg, tables))(rgbq)
        check("i8 digit-sums palette ids exact", bool(
            (np.asarray(pali.parent_ids)
             == np.asarray(palr.parent_ids)).all()))
        check("i8 digit-sums palette pct exact", bool(np.abs(
            np.asarray(pali.percentages)
            - np.asarray(palr.percentages)).max() == 0.0))
        dh = np.abs(np.asarray(pali.hsv) - np.asarray(palr.hsv)).max()
        check(f"i8 digit-sums palette hsv close ({dh:.1e})", dh < 1e-3)
    finally:
        if old_i8 is None:
            os.environ.pop("PHOTOHIVE_SUMS_I8", None)
        else:
            os.environ["PHOTOHIVE_SUMS_I8"] = old_i8

    # polar bins
    h_dim, w_dim = 480, 640
    geom = polar_geometry(h_dim, w_dim, cfg.angle_partitions,
                          cfg.radius_partitions)
    p = h_dim * (w_dim // 2 + 1)
    vals = jnp.asarray(rng.random((4, p)), jnp.float32)
    sums = np.asarray(jax.jit(
        lambda v: pk.polar_bin_sums(v, jnp.asarray(geom.bin_ids), 2880)
    )(vals))
    ref0 = np.bincount(geom.bin_ids,
                       weights=np.asarray(vals[0], np.float64),
                       minlength=2880)
    rel = np.linalg.norm(sums[0] - ref0) / np.linalg.norm(ref0)
    check(f"polar_bin_sums SNR ({rel:.1e})", rel < 1e-5)

    # palette end to end, random (tie-heavy) data
    b = 4
    h = jnp.asarray(rng.random((b, 480, 640)) * 360, jnp.float32)
    s = jnp.asarray(rng.random((b, 480, 640)) * 0.999, jnp.float32)
    v = jnp.asarray(rng.random((b, 480, 640)) * 0.999, jnp.float32)
    fast = jax.jit(lambda *a: quantize.color_palette_batched(
        *a, cfg, tables, True))(h, s, v)
    slow = jax.jit(lambda *a: quantize.color_palette_batched(
        *a, cfg, tables, False))(h, s, v)
    check("palette ids exact", bool(
        (np.asarray(fast.parent_ids) == np.asarray(slow.parent_ids)).all()))
    check("palette pct exact", bool(np.abs(
        np.asarray(fast.percentages) - np.asarray(slow.percentages)
    ).max() == 0.0))
    hsv_err = np.abs(np.asarray(fast.hsv) - np.asarray(slow.hsv)).max()
    check(f"palette hsv close ({hsv_err:.1e})", hsv_err < 5e-3)

    # wide-branch palette kernel (q=40): random images take the narrow q=8
    # cond branch, so compile+check the full-width Mosaic variant directly
    from photohive_dsp_tpu.ops.geometry import octree_geometry
    q_full = max(8, -(-octree_geometry(cfg).max_tie_candidates // 8) * 8)
    if q_full > 8:
        c = cfg.num_cells
        cells = jax.vmap(lambda a, b2, c2: quantize.assign_cells(
            a, b2, c2, cfg))(h, s, v).reshape(b, -1)
        counts = jax.vmap(lambda x: quantize.cell_counts(x, c))(cells)
        assign = jax.vmap(lambda cnt: quantize.parent_assignment(
            cnt, 480 * 640, cfg, tables))(counts)
        luts = jax.vmap(lambda a: pk.palette_candidate_lut(
            a, tables, c, q_full))(assign)
        wide = jax.jit(lambda *a: pk.palette_sums_by_k(*a, c, q_full, cfg))(
            h.reshape(b, -1), s.reshape(b, -1), v.reshape(b, -1), luts)
        ref_sums = jax.jit(jax.vmap(
            lambda hh, ss, vv, cc2, a: quantize.palette_pixel_sums(
                hh, ss, vv, cc2, a, cfg, tables)[a.order]))(
            h.reshape(b, 480, 640), s.reshape(b, 480, 640),
            v.reshape(b, 480, 640), cells, assign)
        check("wide palette kernel counts exact", bool(np.array_equal(
            np.asarray(wide[..., 3]), np.asarray(ref_sums[..., 3]))))

        # C-wide A/B kernel variant on-chip
        from photohive_dsp_tpu.ops import pallas_kernels_cwide as pkc
        opnds = jax.vmap(lambda a: pkc.cwide_tables(a, tables, c))(assign)
        cw = jax.jit(lambda *a: pkc.palette_sums_by_k_cwide(*a, c, cfg))(
            h.reshape(b, -1), s.reshape(b, -1), v.reshape(b, -1), *opnds)
        check("cwide palette kernel counts exact", bool(np.array_equal(
            np.asarray(cw[..., 3]), np.asarray(ref_sums[..., 3]))))
        # Relative bound: hue sums reach ~1e7 here (dominant slot x 360
        # degrees), where one f32 ulp is ~1 — the wide kernel's merged
        # block contraction reassociates its adds, so an absolute 0.5
        # bound would flag single-ulp movement.  Counts stay exact
        # (checked above for both kernels).
        wide_np, cw_np = np.asarray(wide), np.asarray(cw)
        scale = max(1.0, float(np.abs(wide_np).max()))
        check("cwide matches wide kernel", bool(
            np.abs(cw_np - wide_np).max() < 1e-5 * scale))

    # non-default config: C=75 (not a sublane multiple) exercises the
    # equal-to-array-dims BlockSpec escape in Mosaic, plus different
    # q_pad/polar geometry
    cfg2 = ReportConfig(h_partitions=12, s_partitions=3, v_partitions=2,
                        radius_partitions=10, angle_partitions=24)
    tabs2 = ReportTables.build(480, 640, cfg2)
    rgb2 = jnp.asarray(rng.random((2, 3, 480, 640)), jnp.float32)
    zb = jnp.zeros((2, 10, 4), jnp.int32)
    zv = jnp.zeros((2, 10), bool)
    fp2 = jax.jit(lambda *a: full_report_batched(*a, tabs2, cfg2, True))(
        rgb2, zb, zv)
    xp2 = jax.jit(lambda *a: full_report_batched(*a, tabs2, cfg2, False))(
        rgb2, zb, zv)
    check("nondefault-config palette ids exact", bool(
        (np.asarray(fp2.palette_ids) == np.asarray(xp2.palette_ids)).all()))

    # full pipeline
    rgb = jnp.asarray(rng.random((b, 3, 480, 640)), jnp.float32)
    boxes = jnp.zeros((b, 10, 4), jnp.int32).at[:, 0].set(
        jnp.asarray([40, 200, 60, 300], jnp.int32))
    bvalid = jnp.zeros((b, 10), bool).at[:, 0].set(True)
    tabs = ReportTables.build(480, 640, cfg)
    fp = jax.jit(lambda *a: full_report_batched(*a, tabs, cfg, True))(
        rgb, boxes, bvalid)
    xp = jax.jit(lambda *a: full_report_batched(*a, tabs, cfg, False))(
        rgb, boxes, bvalid)
    bins_rel = (np.linalg.norm(np.asarray(fp.blur_bins)
                               - np.asarray(xp.blur_bins))
                / np.linalg.norm(np.asarray(xp.blur_bins)))
    check(f"pipeline bins close ({bins_rel:.1e})", bins_rel < 1e-4)
    check("pipeline vectors exact", bool(
        (np.asarray(fp.blur_vector_angles)
         == np.asarray(xp.blur_vector_angles)).all()))
    check("pipeline palette ids exact", bool(
        (np.asarray(fp.palette_ids) == np.asarray(xp.palette_ids)).all()))
    sh_f = np.asarray(fp.sharpness)[:, 0]
    sh_x = np.asarray(xp.sharpness)[:, 0]
    sh_rel = np.abs(sh_f - sh_x).max() / max(np.abs(sh_x).max(), 1e-9)
    check(f"pipeline sharpness close ({sh_rel:.1e})", sh_rel < 1e-4)

    # batched sharpness (shared-response + ring corrections) vs the
    # per-box masked formulation, on-chip
    from photohive_dsp_tpu.ops.sharpness import (variance_sharpness,
                                                 variance_sharpness_batched)
    pgm = jnp.asarray(rng.random((b, 480, 640)), jnp.float32)
    bx = np.zeros((b, 10, 4), np.int32)
    bx[:, 0] = (40, 200, 60, 300)
    bx[:, 1] = (0, 480, 0, 640)
    bx[:, 2] = (100, 102, 50, 52)
    bv = np.zeros((b, 10), bool)
    bv[:, :3] = True
    fastsh = np.asarray(jax.jit(variance_sharpness_batched)(
        pgm, jnp.asarray(bx), jnp.asarray(bv)))
    refsh = np.asarray(jax.jit(jax.vmap(variance_sharpness))(
        pgm, jnp.asarray(bx), jnp.asarray(bv)))
    rel = (np.abs(fastsh - refsh)[bv].max()
           / max(np.abs(refsh[bv]).max(), 1e-9))
    check(f"batched sharpness close ({rel:.1e})", rel < 1e-4)

    # u8 ingest: every flavor — host numpy (correctly rounded /255), the
    # on-device XLA u8_to_unit_f32 sequence, and the u8-native Mosaic
    # kernels' in-kernel sequence — must be BIT-IDENTICAL (exhaustive over
    # all 256 values; the raw hardware divides disagree, which is why the
    # division-free sequence exists — ops/colorspace.u8_to_unit_f32).
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from photohive_dsp_tpu.ops.colorspace import INV255_F32, u8_to_unit_f32

    uvals = np.arange(256, dtype=np.uint8).reshape(2, 128)
    u256 = jnp.asarray(np.broadcast_to(uvals[:, None, :], (2, 8, 128)))

    def _conv_kern(x_ref, o_ref):
        xf = x_ref[0].astype(jnp.int32).astype(jnp.float32)
        q0 = xf * INV255_F32
        s = jax.lax.bitcast_convert_type(
            jax.lax.bitcast_convert_type(q0, jnp.int32) + (8 << 23),
            jnp.float32)
        rr = (xf - s) + q0
        q = q0 + rr * INV255_F32
        o_ref[0] = jnp.where(xf == 0.0, 0.0, q)

    mos = np.asarray(pl.pallas_call(
        _conv_kern, grid=(2,),
        in_specs=[pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((2, 8, 128), jnp.float32),
    )(u256))
    xlacv = np.asarray(jax.jit(u8_to_unit_f32)(u256))
    hostcv = (np.asarray(u256).astype(np.float32)
              / np.float32(255.0))
    check("u8 ingest exact: mosaic == host (all 256)",
          bool(np.array_equal(mos, hostcv)))
    check("u8 ingest exact: xla == host (all 256)",
          bool(np.array_equal(xlacv, hostcv)))

    old_var = os.environ.get("PHOTOHIVE_PALETTE_KERNEL")
    os.environ["PHOTOHIVE_PALETTE_KERNEL"] = "bf16"
    try:
        u8img = jnp.asarray(rng.integers(0, 256, (2, 3, 96, 128)),
                            jnp.uint8)
        f32img = jnp.asarray(np.asarray(u8img).astype(np.float32)
                             / np.float32(255.0))
        pu8, su8 = jax.jit(lambda x: quantize.color_palette_batched_from_rgb(
            x, cfg, tables))(u8img)
        pf32, sf32 = jax.jit(lambda x: quantize.color_palette_batched_from_rgb(
            x, cfg, tables))(f32img)
        check("u8 palette ids exact", bool(np.array_equal(
            np.asarray(pu8.parent_ids), np.asarray(pf32.parent_ids))))
        check("u8 palette pct exact", bool(np.array_equal(
            np.asarray(pu8.percentages), np.asarray(pf32.percentages))))
        check("u8 saturation sum exact", bool(np.array_equal(
            np.asarray(su8), np.asarray(sf32))))
    finally:
        if old_var is None:
            os.environ.pop("PHOTOHIVE_PALETTE_KERNEL", None)
        else:
            os.environ["PHOTOHIVE_PALETTE_KERNEL"] = old_var

    # Pallas 2-D FFT magnitude kernels (scrambled layout) vs XLA rfft2,
    # unscrambled on the host via the static maps.  The full-pipeline
    # check above already covers the bins; this isolates the kernels.
    from photohive_dsp_tpu.ops import pallas_fft
    from photohive_dsp_tpu.ops.fft import magnitude_fft

    fh, fw = 480, 640
    assert pallas_fft.eligible(fh, fw)
    plan = pallas_fft.FftPlan.for_shape(fh, fw)
    pgm2 = jnp.asarray(rng.standard_normal((2, fh, fw)) * 40, jnp.float32)
    magk = np.asarray(jax.jit(
        lambda x: pallas_fft.magnitude2_scrambled(x, plan))(pgm2))
    magx = np.asarray(jax.jit(jax.vmap(magnitude_fft))(pgm2))
    true_row, true_col = pallas_fft.scramble_maps(fh, fw)
    flat = magk.transpose(0, 2, 1, 3).reshape(2, fh, -1)
    keep = true_col <= fw // 2
    got = flat[:, np.argsort(true_row)][:, :, keep][
        :, :, np.argsort(true_col[keep])]
    fft_rel = (np.linalg.norm(got - magx) / np.linalg.norm(magx))
    check(f"pallas fft magnitude close ({fft_rel:.1e})", fft_rel < 1e-5)

    # Widened-eligibility FFT shapes (round 5): Q>32 group-FFT row
    # combine, 7/13 column radices, and the 8K factored-twiddle path —
    # each vs XLA rfft2 magnitude on-device.  8K runs at batch 1 (the
    # XLA reference lowering alone is ~2 GB of HBM there).
    for (fh2, fw2, nb) in ((40, 4608, 2), (728, 384, 2), (4320, 7680, 1)):
        if not pallas_fft.eligible(fh2, fw2):
            check(f"pallas fft {fh2}x{fw2} eligible", False)
            continue
        plan2 = pallas_fft.FftPlan.for_shape(fh2, fw2)
        x2 = jnp.asarray(rng.standard_normal((nb, fh2, fw2)) * 40,
                         jnp.float32)
        magk2 = np.asarray(jax.jit(
            lambda x: pallas_fft.magnitude2_scrambled(x, plan2))(x2))
        magx2 = np.asarray(jax.jit(jax.vmap(magnitude_fft))(x2))
        tr2, tc2 = pallas_fft.scramble_maps(fh2, fw2)
        flat2 = magk2.transpose(0, 2, 1, 3).reshape(nb, fh2, -1)
        keep2 = tc2 <= fw2 // 2
        got2 = flat2[:, np.argsort(tr2)][:, :, keep2][
            :, :, np.argsort(tc2[keep2])]
        rel2 = np.linalg.norm(got2 - magx2) / np.linalg.norm(magx2)
        check(f"pallas fft {fh2}x{fw2} magnitude close ({rel2:.1e})"
              f"{' [factored twiddles]' if plan2.col_factored else ''}",
              rel2 < 1e-5)

    print("ALL OK" if ok else "FAILURES PRESENT")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
