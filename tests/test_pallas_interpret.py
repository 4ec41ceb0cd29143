"""CPU coverage for the Pallas fast path via Mosaic interpret mode.

The CPU backend can't execute compiled Mosaic kernels, so the TPU fast path
would otherwise only be exercised by tools/tpu_parity_check.py on hardware.
``pltpu.force_tpu_interpret_mode`` emulates the kernels op-by-op on CPU,
which pins their *logic* (candidate tables, tie-break argmin, split-term
exactness, cond branch selection) in CI; Mosaic-compiler behavior is still
validated on-chip by the parity tool.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from photohive_dsp_tpu.config import ReportConfig
from photohive_dsp_tpu.ops import pallas_kernels as pk
from photohive_dsp_tpu.ops import quantize
from photohive_dsp_tpu.ops.geometry import polar_geometry


@pytest.fixture(scope="module")
def cfg():
    return ReportConfig()


@pytest.fixture(scope="module")
def tables(cfg):
    return quantize.OctreeTables.for_config(cfg)


def test_palette_kernel_interpret_matches_xla(cfg, tables):
    rng = np.random.default_rng(0)
    b = 2
    h = jnp.asarray(rng.random((b, 96, 128)) * 360, jnp.float32)
    s = jnp.asarray(rng.random((b, 96, 128)) * 0.999, jnp.float32)
    v = jnp.asarray(rng.random((b, 96, 128)) * 0.999, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        fast = quantize.color_palette_batched(h, s, v, cfg, tables, True)
    slow = quantize.color_palette_batched(h, s, v, cfg, tables, False)
    assert (np.asarray(fast.parent_ids) == np.asarray(slow.parent_ids)).all()
    assert np.array_equal(np.asarray(fast.percentages),
                          np.asarray(slow.percentages))
    assert np.abs(np.asarray(fast.hsv) - np.asarray(slow.hsv)).max() < 5e-3


def test_palette_kernel_interpret_wide_branch(cfg, tables):
    """Force the full-width (q=40) kernel and check it agrees too."""
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.random((1, 64, 128)) * 360, jnp.float32)
    s = jnp.asarray(rng.random((1, 64, 128)) * 0.999, jnp.float32)
    v = jnp.asarray(rng.random((1, 64, 128)) * 0.999, jnp.float32)
    c = cfg.num_cells
    total = 64 * 128
    cells = jax.vmap(lambda a, b2, c2: quantize.assign_cells(a, b2, c2, cfg))(
        h, s, v).reshape(1, -1)
    counts = jax.vmap(lambda x: quantize.cell_counts(x, c))(cells)
    assign = jax.vmap(lambda cnt: quantize.parent_assignment(
        cnt, total, cfg, tables))(counts)
    with pltpu.force_tpu_interpret_mode():
        luts = jax.vmap(lambda a: pk.palette_candidate_lut(
            a, tables, c, 40))(assign)
        sums = pk.palette_sums_by_k(h.reshape(1, -1), s.reshape(1, -1),
                                    v.reshape(1, -1), luts, c, 40, cfg)
    ref = jax.vmap(lambda hh, ss, vv, cc2, a: quantize.palette_pixel_sums(
        hh, ss, vv, cc2, a, cfg, tables))(h, s, v, cells, assign)
    ref_by_k = jax.vmap(lambda sm, o: sm[o])(ref, assign.order)
    assert np.array_equal(np.asarray(sums[..., 3]),
                          np.asarray(ref_by_k[..., 3]))  # counts exact
    assert np.abs(np.asarray(sums) - np.asarray(ref_by_k)).max() < 0.5


def test_palette_kernel_cwide_interpret(cfg, tables):
    """The C-wide A/B variant (pallas_kernels_cwide) matches the XLA path
    bit-for-bit on counts and to rounding on the split sums."""
    from photohive_dsp_tpu.ops import pallas_kernels_cwide as pkc

    rng = np.random.default_rng(6)
    b = 2
    h = jnp.asarray(rng.random((b, 64, 128)) * 360, jnp.float32)
    s = jnp.asarray(rng.random((b, 64, 128)) * 0.999, jnp.float32)
    v = jnp.asarray(rng.random((b, 64, 128)) * 0.999, jnp.float32)
    c = cfg.num_cells
    total = 64 * 128
    cells = jax.vmap(lambda a, b2, c2: quantize.assign_cells(a, b2, c2, cfg))(
        h, s, v).reshape(b, -1)
    counts = jax.vmap(lambda x: quantize.cell_counts(x, c))(cells)
    assign = jax.vmap(lambda cnt: quantize.parent_assignment(
        cnt, total, cfg, tables))(counts)
    with pltpu.force_tpu_interpret_mode():
        opnds = jax.vmap(lambda a: pkc.cwide_tables(a, tables, c))(assign)
        sums = pkc.palette_sums_by_k_cwide(
            h.reshape(b, -1), s.reshape(b, -1), v.reshape(b, -1),
            *opnds, c, cfg)
    ref = jax.vmap(lambda hh, ss, vv, cc2, a: quantize.palette_pixel_sums(
        hh, ss, vv, cc2, a, cfg, tables))(h, s, v, cells, assign)
    ref_by_k = jax.vmap(lambda sm, o: sm[o])(ref, assign.order)
    assert np.array_equal(np.asarray(sums[..., 3]),
                          np.asarray(ref_by_k[..., 3]))  # counts exact
    assert np.abs(np.asarray(sums) - np.asarray(ref_by_k)).max() < 0.5


def test_palette_cwide_selected_by_env(cfg, tables, monkeypatch):
    """The env switch routes the fused palette pass through the C-wide
    kernel with unchanged results."""
    monkeypatch.setenv("PHOTOHIVE_PALETTE_KERNEL", "cwide")
    rng = np.random.default_rng(7)
    h = jnp.asarray(rng.random((1, 64, 128)) * 360, jnp.float32)
    s = jnp.asarray(rng.random((1, 64, 128)) * 0.999, jnp.float32)
    v = jnp.asarray(rng.random((1, 64, 128)) * 0.999, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        fast = quantize.color_palette_batched(h, s, v, cfg, tables, True)
    slow = quantize.color_palette_batched(h, s, v, cfg, tables, False)
    assert (np.asarray(fast.parent_ids) == np.asarray(slow.parent_ids)).all()
    assert np.array_equal(np.asarray(fast.percentages),
                          np.asarray(slow.percentages))
    assert np.abs(np.asarray(fast.hsv) - np.asarray(slow.hsv)).max() < 5e-3


def test_palette_kernels_drop_hue_sentinel_pixels(cfg, tables):
    """Pixels marked with hue -1 (decimation-masked rows in the sharded
    body, chunk padding in the wrappers) contribute to NOTHING: sums and
    counts must bit-match the same kernel run on only the real pixels."""
    from photohive_dsp_tpu.ops import pallas_kernels_cwide as pkc

    rng = np.random.default_rng(8)
    c = cfg.num_cells
    p_real, p_masked = 4096, 1024
    h_real = jnp.asarray(rng.random((1, p_real)) * 360, jnp.float32)
    s_real = jnp.asarray(rng.random((1, p_real)) * 0.999, jnp.float32)
    v_real = jnp.asarray(rng.random((1, p_real)) * 0.999, jnp.float32)
    # masked tail: real-looking s/v, sentinel hue
    h_all = jnp.concatenate(
        [h_real, jnp.full((1, p_masked), -1.0, jnp.float32)], axis=1)
    s_all = jnp.concatenate(
        [s_real, jnp.asarray(rng.random((1, p_masked)), jnp.float32)], 1)
    v_all = jnp.concatenate(
        [v_real, jnp.asarray(rng.random((1, p_masked)), jnp.float32)], 1)

    cells = quantize.assign_cells(h_real, s_real, v_real, cfg).reshape(1, -1)
    counts = jax.vmap(lambda x: quantize.cell_counts(x, c))(cells)
    assign = jax.vmap(lambda cnt: quantize.parent_assignment(
        cnt, p_real, cfg, tables))(counts)
    with pltpu.force_tpu_interpret_mode():
        luts = jax.vmap(lambda a: pk.palette_candidate_lut(
            a, tables, c, 40))(assign)
        sums_all = pk.palette_sums_by_k(h_all, s_all, v_all, luts, c, 40,
                                        cfg)
        sums_real = pk.palette_sums_by_k(h_real, s_real, v_real, luts, c,
                                         40, cfg)
        opnds = jax.vmap(lambda a: pkc.cwide_tables(a, tables, c))(assign)
        cw_all = pkc.palette_sums_by_k_cwide(h_all, s_all, v_all, *opnds,
                                             c, cfg)
        cw_real = pkc.palette_sums_by_k_cwide(h_real, s_real, v_real,
                                              *opnds, c, cfg)
    assert np.array_equal(np.asarray(sums_all), np.asarray(sums_real))
    assert np.array_equal(np.asarray(cw_all), np.asarray(cw_real))
    assert np.asarray(sums_all)[..., 3].sum() == p_real  # counts: real only


def test_polar_bin_sums_interpret(cfg):
    rng = np.random.default_rng(2)
    geom = polar_geometry(240, 320, cfg.angle_partitions,
                          cfg.radius_partitions)
    p = 240 * (320 // 2 + 1)
    num_bins = cfg.angle_partitions * cfg.radius_partitions
    vals = jnp.asarray(rng.random((2, p)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        sums = np.asarray(pk.polar_bin_sums(vals, jnp.asarray(geom.bin_ids),
                                            num_bins))
    ref = np.bincount(geom.bin_ids, weights=np.asarray(vals[0], np.float64),
                      minlength=num_bins)
    rel = np.linalg.norm(sums[0] - ref) / np.linalg.norm(ref)
    assert rel < 1e-6


def test_cell_counts_interpret(cfg):
    rng = np.random.default_rng(3)
    cells = jnp.asarray(rng.integers(0, cfg.num_cells, (2, 12345)), jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        got = pk.cell_counts_batched(cells, cfg.num_cells)
    ref = jax.vmap(lambda x: quantize.cell_counts(x, cfg.num_cells))(cells)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_cell_counts_from_hsv_interpret(cfg):
    """The hsv-input histogram kernel (in-kernel cell assignment) matches
    assign_cells + compare-reduce exactly, and hue-sentinel pixels count
    for nothing."""
    rng = np.random.default_rng(10)
    b, p_real, p_masked = 2, 5000, 432
    h = jnp.asarray(rng.random((b, p_real)) * 360, jnp.float32)
    s = jnp.asarray(rng.random((b, p_real)) * 0.999, jnp.float32)
    v = jnp.asarray(rng.random((b, p_real)) * 0.999, jnp.float32)
    # Exercise boundary-adjacent values too: snap a slice of pixels onto
    # exact cell-edge s/v/h values where divide/clip rounding matters.
    s = s.at[:, :200].set(jnp.float32(cfg.gray_thresh))
    v = v.at[:, 200:400].set(jnp.float32(cfg.black_thresh))
    h = h.at[:, 400:600].set(jnp.float32(cfg.cell_Lh) * 3)
    h_all = jnp.concatenate(
        [h, jnp.full((b, p_masked), -1.0, jnp.float32)], axis=1)
    s_all = jnp.concatenate(
        [s, jnp.asarray(rng.random((b, p_masked)), jnp.float32)], 1)
    v_all = jnp.concatenate(
        [v, jnp.asarray(rng.random((b, p_masked)), jnp.float32)], 1)
    with pltpu.force_tpu_interpret_mode():
        got = pk.cell_counts_from_hsv(h_all, s_all, v_all, cfg)
    cells = jax.vmap(lambda a, b2, c2: quantize.assign_cells(
        a, b2, c2, cfg))(h, s, v)
    ref = jax.vmap(lambda x: quantize.cell_counts(x, cfg.num_cells))(cells)
    assert np.array_equal(np.asarray(got), np.asarray(ref))
    assert np.asarray(got).sum() == b * p_real


def test_full_pipeline_interpret(cfg):
    """The fused use_pallas=True report program end to end (kernel wiring,
    cond branch, batched sharpness) against the XLA path."""
    from photohive_dsp_tpu.models.pipeline import (ReportTables,
                                                   full_report_batched)
    rng = np.random.default_rng(5)
    tabs = ReportTables.build(240, 320, cfg)
    rgb = jnp.asarray(rng.random((2, 3, 240, 320)), jnp.float32)
    boxes = jnp.zeros((2, 10, 4), jnp.int32).at[:, 0].set(
        jnp.asarray([40, 200, 60, 300], jnp.int32))
    valid = jnp.zeros((2, 10), bool).at[:, 0].set(True)
    with pltpu.force_tpu_interpret_mode():
        fp = full_report_batched(rgb, boxes, valid, tabs, cfg, True)
    xp = full_report_batched(rgb, boxes, valid, tabs, cfg, False)
    assert (np.asarray(fp.palette_ids) == np.asarray(xp.palette_ids)).all()
    assert np.array_equal(np.asarray(fp.palette_pct),
                          np.asarray(xp.palette_pct))
    ref_bins = np.asarray(xp.blur_bins)
    rel = (np.linalg.norm(np.asarray(fp.blur_bins) - ref_bins)
           / np.linalg.norm(ref_bins))
    assert rel < 1e-6
    assert (np.asarray(fp.blur_vector_angles)
            == np.asarray(xp.blur_vector_angles)).all()
    assert np.array_equal(np.asarray(fp.sharpness),
                          np.asarray(xp.sharpness))


def test_full_pipeline_interpret_nondefault_config():
    """Kernels under a non-default config: C=12*3*2+2+1=75 (not a sublane
    multiple), different q_pad geometry, non-default polar bins.  Pins the
    fixed-shape machinery (block specs use equal-to-array dims, candidate
    geometry is config-derived) beyond the default 112-cell case."""
    from photohive_dsp_tpu.models.pipeline import (ReportTables,
                                                   full_report_batched)
    cfg2 = ReportConfig(h_partitions=12, s_partitions=3, v_partitions=2,
                       radius_partitions=10, angle_partitions=24)
    rng = np.random.default_rng(9)
    tabs = ReportTables.build(240, 320, cfg2)
    rgb = jnp.asarray(rng.random((2, 3, 240, 320)), jnp.float32)
    boxes = jnp.zeros((2, 10, 4), jnp.int32).at[:, 0].set(
        jnp.asarray([40, 200, 60, 300], jnp.int32))
    valid = jnp.zeros((2, 10), bool).at[:, 0].set(True)
    with pltpu.force_tpu_interpret_mode():
        fp = full_report_batched(rgb, boxes, valid, tabs, cfg2, True)
    xp = full_report_batched(rgb, boxes, valid, tabs, cfg2, False)
    assert (np.asarray(fp.palette_ids) == np.asarray(xp.palette_ids)).all()
    assert np.array_equal(np.asarray(fp.palette_pct),
                          np.asarray(xp.palette_pct))
    ref_bins = np.asarray(xp.blur_bins)
    rel = (np.linalg.norm(np.asarray(fp.blur_bins) - ref_bins)
           / np.linalg.norm(ref_bins))
    assert rel < 1e-6


def test_rgb_palette_kernels_interpret(cfg, tables):
    """The rgb-native kernels (in-kernel HSV + saturation sum) against the
    XLA path, at a multi-lane-chunk width (2304 -> two 1152-lane chunks
    per row under the 2048-lane cap) so the static chunk loop is
    exercised."""
    from photohive_dsp_tpu.ops import pallas_kernels as pk
    assert pk.palette_rgb_eligible(16, 2304)
    assert pk._lane_chunk(2304) == 1152
    assert pk._lane_chunk(2304, 1024) == 768  # wide-tier cap still chunks
    rng = np.random.default_rng(11)
    rgb = jnp.asarray(rng.random((2, 3, 16, 2304)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        pal, s_sum = quantize.color_palette_batched_from_rgb(rgb, cfg,
                                                             tables)
    from photohive_dsp_tpu.ops.colorspace import rgb_to_hsv
    h, s, v = jax.vmap(lambda x: rgb_to_hsv(x[0], x[1], x[2]))(rgb)
    slow = quantize.color_palette_batched(h, s, v, cfg, tables, False)
    assert (np.asarray(pal.parent_ids) == np.asarray(slow.parent_ids)).all()
    assert np.array_equal(np.asarray(pal.percentages),
                          np.asarray(slow.percentages))
    assert np.abs(np.asarray(pal.hsv) - np.asarray(slow.hsv)).max() < 5e-3
    s_ref = np.asarray(jnp.sum(s, axis=(1, 2)))
    assert np.abs(np.asarray(s_sum) - s_ref).max() < 1e-6 * s_ref.max()


def test_rgb_palette_q1_kernel_interpret(cfg, tables):
    """The q=1-tier rgb kernel (sums by cell + slot remap): a low-color
    structured image with no tied populated cell must produce ids/pct
    identical to the XLA path through the q1 branch."""
    rng = np.random.default_rng(4)
    yg, xg = np.mgrid[0:64, 0:384].astype(np.float32)
    r = 0.25 + 0.5 * (xg / 384)
    g = 0.25 + 0.5 * (yg / 64)
    b = 0.4 + 0 * xg
    rgb = np.stack([np.stack([r, g, b]) for _ in range(2)])
    rgb = np.clip(rgb + rng.normal(0, 0.005, rgb.shape), 0, 1)
    rgbj = jnp.asarray(rgb, jnp.float32)
    from photohive_dsp_tpu.ops.colorspace import rgb_to_hsv
    h, s, v = jax.vmap(lambda x: rgb_to_hsv(x[0], x[1], x[2]))(rgbj)
    cells = jax.vmap(lambda a, b2, c2: quantize.assign_cells(
        a, b2, c2, cfg))(h, s, v).reshape(2, -1)
    counts = jax.vmap(lambda x: quantize.cell_counts(
        x, cfg.num_cells))(cells)
    assign = jax.vmap(lambda cnt: quantize.parent_assignment(
        cnt, 64 * 384, cfg, tables))(counts)
    ncand = jnp.sum(assign.allowed, axis=-1)
    assert int(jnp.max(jnp.where(counts > 0, ncand, 0))) == 1  # q1 branch
    with pltpu.force_tpu_interpret_mode():
        pal, _ = quantize.color_palette_batched_from_rgb(rgbj, cfg, tables)
    slow = quantize.color_palette_batched(h, s, v, cfg, tables, False)
    assert (np.asarray(pal.parent_ids) == np.asarray(slow.parent_ids)).all()
    assert np.array_equal(np.asarray(pal.percentages),
                          np.asarray(slow.percentages))
    assert np.abs(np.asarray(pal.hsv) - np.asarray(slow.hsv)).max() < 5e-3


def test_rgb_palette_route_predicate(cfg):
    """Routing: tile-aligned shapes go rgb-native; others stay flat; the
    cwide A/B variant never routes rgb-native."""
    from photohive_dsp_tpu.ops import pallas_kernels as pk
    assert pk.palette_rgb_eligible(1080, 1920)
    assert pk.palette_rgb_eligible(2160, 3840)
    assert pk.palette_rgb_eligible(720, 1280)
    assert not pk.palette_rgb_eligible(720, 1080)   # 1080 % 128 != 0
    assert not pk.palette_rgb_eligible(1081, 1920)  # 1081 % 8 != 0
    assert not pk.palette_rgb_eligible(4320, 7680)  # counts overflow bound
    assert quantize.use_rgb_palette_path(True, 1080, 1920)
    assert not quantize.use_rgb_palette_path(False, 1080, 1920)
    import os
    os.environ["PHOTOHIVE_PALETTE_KERNEL"] = "cwide"
    try:
        assert not quantize.use_rgb_palette_path(True, 1080, 1920)
    finally:
        del os.environ["PHOTOHIVE_PALETTE_KERNEL"]


def test_full_pipeline_interpret_rgb_route(cfg):
    """The fused report at a tile-aligned shape (240x384) — the rgb-native
    kernel route — against the XLA path, including the s_bar-from-kernel
    numerator."""
    from photohive_dsp_tpu.models.pipeline import (ReportTables,
                                                   full_report_batched)
    from photohive_dsp_tpu.ops import quantize as q
    assert q.use_rgb_palette_path(True, 240, 384)
    rng = np.random.default_rng(12)
    tabs = ReportTables.build(240, 384, cfg)
    rgb = jnp.asarray(rng.random((2, 3, 240, 384)), jnp.float32)
    boxes = jnp.zeros((2, 10, 4), jnp.int32).at[:, 0].set(
        jnp.asarray([40, 200, 60, 300], jnp.int32))
    valid = jnp.zeros((2, 10), bool).at[:, 0].set(True)
    with pltpu.force_tpu_interpret_mode():
        fp = full_report_batched(rgb, boxes, valid, tabs, cfg, True)
    xp = full_report_batched(rgb, boxes, valid, tabs, cfg, False)
    assert (np.asarray(fp.palette_ids) == np.asarray(xp.palette_ids)).all()
    assert np.array_equal(np.asarray(fp.palette_pct),
                          np.asarray(xp.palette_pct))
    s_ref = np.asarray(xp.average_saturation)
    assert np.abs(np.asarray(fp.average_saturation) - s_ref).max() \
        < 1e-6 * max(1.0, s_ref.max())
    assert np.array_equal(np.asarray(fp.sharpness),
                          np.asarray(xp.sharpness))


def test_margin_sort_interpret(cfg):
    rng = np.random.default_rng(4)
    sal = jnp.asarray(np.round(rng.random((4, cfg.num_cells)) * 30)
                      + rng.random((4, cfg.num_cells)) * 0.6, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = pk.margin_sort(sal)
    ref = jax.vmap(quantize.margin_insertion_argsort)(sal)
    assert np.array_equal(np.asarray(got), np.asarray(ref))


def test_bf16_variant_kernels_match_candidate(cfg, tables):
    """The bf16-operand/full-sublane rgb kernels (ops/pallas_kernels_bf16)
    against the 'candidate' rgb kernels: counts are EXACT (0/1 products in
    an f32 accumulator, any add order); hue/s/v sums may move by f32
    rounding order only — the block-merged sums GEMM reassociates the
    per-chunk adds (like any shard split), every product still being a
    0/1 one-hot against bf16-exact split terms."""
    from photohive_dsp_tpu.ops import pallas_kernels_bf16 as pkv

    def close(a, b):
        a, b = np.asarray(a), np.asarray(b)
        assert np.abs(a - b).max() <= 1e-5 * max(1.0, np.abs(a).max())

    rng = np.random.default_rng(17)
    rgb = jnp.asarray(rng.random((2, 3, 16, 256)), jnp.float32)
    c = cfg.num_cells
    with pltpu.force_tpu_interpret_mode():
        c0, s0 = pk.cell_counts_s_from_rgb(rgb, cfg)
        c1, s1 = pkv.cell_counts_s_from_rgb(rgb, cfg)
        assert np.array_equal(np.asarray(c0), np.asarray(c1))
        close(s0, s1)

        sal = jax.vmap(lambda x: quantize.saliency_f32(
            x, tables.s_v_f32, cfg))(c0)
        order = quantize.saliency_argsort(sal, True)
        assign = jax.vmap(lambda cnt, o: quantize.parent_assignment_from_order(
            cnt, o, 16 * 256, cfg, tables))(c0, order)
        luts = jax.vmap(lambda a: pk.palette_candidate_lut(
            a, tables, c, 8))(assign)
        wide0 = pk.palette_sums_by_k_rgb(rgb, luts, c, 8, cfg)
        wide1 = pkv.palette_sums_by_k_rgb(rgb, luts, c, 8, cfg)
        assert np.array_equal(np.asarray(wide0[..., 3]),
                              np.asarray(wide1[..., 3]))  # counts exact
        close(wide0, wide1)

        q10 = pk.palette_sums_by_k_rgb_q1(rgb, assign, tables, c, cfg)
        q11 = pkv.palette_sums_by_k_rgb_q1(rgb, assign, tables, c, cfg)
        assert np.array_equal(np.asarray(q10[..., 3]),
                              np.asarray(q11[..., 3]))
        close(q10, q11)


def test_i8_digit_sums_match_bf16(cfg, tables, monkeypatch):
    """PHOTOHIVE_SUMS_I8: int8 digit-plane palette sums vs the bf16
    split-GEMM default.  Counts must be EXACT (int8 ones x int8 one-hot
    in int32); hue/s/v sums agree to the fixed-point truncation bound
    (<= 2^-19/2^-27 abs per pixel) plus the f32 Horner recombination —
    the digit accumulation itself is int32-exact, tighter than the
    bf16 path's f32 adds.  On-chip validation: tools/tpu_parity_check."""
    from photohive_dsp_tpu.ops import pallas_kernels_bf16 as pkv

    rng = np.random.default_rng(23)
    rgb = jnp.asarray(rng.random((2, 3, 16, 256)), jnp.float32)
    c = cfg.num_cells
    with pltpu.force_tpu_interpret_mode():
        c0, _ = pkv.cell_counts_s_from_rgb(rgb, cfg)
        sal = jax.vmap(lambda x: quantize.saliency_f32(
            x, tables.s_v_f32, cfg))(c0)
        order = quantize.saliency_argsort(sal, True)
        assign = jax.vmap(
            lambda cnt, o: quantize.parent_assignment_from_order(
                cnt, o, 16 * 256, cfg, tables))(c0, order)
        luts = jax.vmap(lambda a: pk.palette_candidate_lut(
            a, tables, c, 8))(assign)
        monkeypatch.delenv("PHOTOHIVE_SUMS_I8", raising=False)
        ref = pkv.palette_sums_by_k_rgb(rgb, luts, c, 8, cfg)
        monkeypatch.setenv("PHOTOHIVE_SUMS_I8", "1")
        got = pkv.palette_sums_by_k_rgb(rgb, luts, c, 8, cfg)
    assert np.array_equal(np.asarray(ref[..., 3]),
                          np.asarray(got[..., 3]))  # counts exact
    a, b = np.asarray(ref), np.asarray(got)
    assert np.abs(a - b).max() <= 1e-6 * max(1.0, np.abs(a).max())


def test_bf16_variant_is_default_and_routes_rgb(cfg, monkeypatch):
    monkeypatch.delenv("PHOTOHIVE_PALETTE_KERNEL", raising=False)
    assert quantize.palette_kernel_variant() == "bf16"
    assert quantize.use_rgb_palette_path(True, 1080, 1920)
    monkeypatch.setenv("PHOTOHIVE_PALETTE_KERNEL", "candidate")
    assert quantize.use_rgb_palette_path(True, 1080, 1920)


def test_pallas_sharpness_kernel_matches_batched(cfg):
    """The masked-tile Pallas sharpness kernel (ops/pallas_sharpness)
    against the XLA batched fast path AND the f64 golden semantics:
    exact masked-crop stencil per box, telescoped ring-weighted response
    sums, per-tile box skipping.  Boxes include image-corner and
    tile-straddling cases."""
    from photohive_dsp_tpu.ops import pallas_sharpness as psp
    from photohive_dsp_tpu.ops import sharpness as sh

    rng = np.random.default_rng(13)
    b, h, w = 2, 64, 256
    pgm = jnp.asarray(rng.random((b, h, w)), jnp.float32)
    boxes = np.zeros((b, 10, 4), np.int32)
    boxes[:, 0] = (5, 40, 10, 200)
    boxes[:, 1] = (20, 64, 100, 256)   # touches bottom/right edges
    boxes[:, 2] = (0, 8, 0, 16)        # image corner
    valid = np.zeros((b, 10), bool)
    valid[:, :3] = True
    db, dv = jnp.asarray(boxes), jnp.asarray(valid)
    assert psp.eligible(h, w)
    with pltpu.force_tpu_interpret_mode():
        s1, s2 = psp.sharpness_sums(pgm, jnp.where(dv[..., None], db, 0))
    n = np.maximum((boxes[..., 1] - boxes[..., 0])
                   * (boxes[..., 3] - boxes[..., 2]), 1)
    mean = np.asarray(s1) / n
    var = np.asarray(s2) / n - mean * mean
    # invalid slots have mean == 0; the NaN/inf of var/mean there is
    # intentionally pinned semantics (masked to 0 below) — silence the
    # RuntimeWarning deliberately rather than letting it rot (VERDICT r4).
    with np.errstate(divide="ignore", invalid="ignore"):
        got = np.where(valid, var / mean, 0.0)
    ref = np.asarray(sh.variance_sharpness_batched(pgm, db, dv))
    rel = np.abs(got - ref)[:, :3] / np.abs(ref)[:, :3]
    assert rel.max() < 1e-5
    assert np.array_equal(got[:, 3:], ref[:, 3:])  # invalid slots zero


def test_rgb_palette_wide_tier_capped_lanes(cfg, tables):
    """The rgb wide (q=40) kernel under its 1024-lane VMEM cap: same
    sums as the q=8 kernel on a no-tie image (q_pad only widens the
    candidate table; extra slots are sentinels)."""
    from photohive_dsp_tpu.ops import pallas_kernels_bf16 as pkv

    rng = np.random.default_rng(21)
    rgb = jnp.asarray(rng.random((1, 3, 16, 2304)), jnp.float32)
    c = cfg.num_cells
    with pltpu.force_tpu_interpret_mode():
        counts, _ = pkv.cell_counts_s_from_rgb(rgb, cfg)
        sal = jax.vmap(lambda x: quantize.saliency_f32(
            x, tables.s_v_f32, cfg))(counts)
        order = quantize.saliency_argsort(sal, True)
        assign = jax.vmap(
            lambda cnt, o: quantize.parent_assignment_from_order(
                cnt, o, 16 * 2304, cfg, tables))(counts, order)
        lut8 = jax.vmap(lambda a: pk.palette_candidate_lut(
            a, tables, c, 8))(assign)
        lut40 = jax.vmap(lambda a: pk.palette_candidate_lut(
            a, tables, c, 40))(assign)
        s8 = pkv.palette_sums_by_k_rgb(rgb, lut8, c, 8, cfg)
        s40 = pkv.palette_sums_by_k_rgb(rgb, lut40, c, 40, cfg)
    assert np.array_equal(np.asarray(s8[..., 3]), np.asarray(s40[..., 3]))
    assert np.abs(np.asarray(s8) - np.asarray(s40)).max() < 1e-2


def test_u8_native_palette_kernels_bit_identical(cfg, tables):
    """The u8-input bf16 kernels must match the f32-input kernels fed
    HOST-converted planes bit-for-bit.  The in-kernel conversion is the
    division-free correctly-rounded sequence (colorspace.u8_to_unit_f32)
    built from IEEE mul/add only — exact here in interpret mode AND on
    silicon (the raw hardware divides would not be: Mosaic and XLA lower
    f32 divide to different approximations; tools/tpu_parity_check.py
    "u8 ingest exact" pins all three flavors on the chip)."""
    import os

    from photohive_dsp_tpu.ops import quantize as qz

    rng = np.random.default_rng(33)
    u8 = jnp.asarray(rng.integers(0, 256, (2, 3, 96, 128)), jnp.uint8)
    f32 = jnp.asarray(np.asarray(u8).astype(np.float32)
                      / np.float32(255.0))
    old = os.environ.get("PHOTOHIVE_PALETTE_KERNEL")
    os.environ["PHOTOHIVE_PALETTE_KERNEL"] = "bf16"
    try:
        with pltpu.force_tpu_interpret_mode():
            pal_u8, ss_u8 = qz.color_palette_batched_from_rgb(u8, cfg,
                                                              tables)
            pal_f32, ss_f32 = qz.color_palette_batched_from_rgb(f32, cfg,
                                                                tables)
    finally:
        if old is None:
            os.environ.pop("PHOTOHIVE_PALETTE_KERNEL", None)
        else:
            os.environ["PHOTOHIVE_PALETTE_KERNEL"] = old
    assert np.array_equal(np.asarray(pal_u8.parent_ids),
                          np.asarray(pal_f32.parent_ids))
    assert np.array_equal(np.asarray(pal_u8.percentages),
                          np.asarray(pal_f32.percentages))
    assert np.array_equal(np.asarray(pal_u8.hsv), np.asarray(pal_f32.hsv))
    assert np.array_equal(np.asarray(ss_u8), np.asarray(ss_f32))


def test_u8_to_unit_f32_exact():
    """The device ingest sequence == correctly rounded x/255.0 for all
    256 inputs, on this backend's IEEE mul/add (division-free)."""
    from photohive_dsp_tpu.ops.colorspace import u8_to_unit_f32

    x = jnp.asarray(np.arange(256, dtype=np.uint8))
    got = np.asarray(jax.jit(u8_to_unit_f32)(x))
    want = np.arange(256, dtype=np.float32) / np.float32(255.0)
    assert np.array_equal(got, want)
