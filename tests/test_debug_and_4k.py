"""Invariant-checker tests + the 4K blur-profile kernel SNR check
(BASELINE.json config #2)."""

import numpy as np
import pytest

import jax.numpy as jnp

import photohive_dsp_tpu as ph
from photohive_dsp_tpu.config import ReportConfig
from photohive_dsp_tpu.ops import blur, colorspace, fft, quantize
from photohive_dsp_tpu.utils import debug as phdebug
from . import golden_ref as gold
from .util import snr_db

CFG = ReportConfig()


def test_invariant_checkers_pass_on_valid_report():
    img = phdebug.create_test_rgb(400, 420)
    h, s, v = colorspace.rgb_to_hsv(*(jnp.asarray(c) for c in img))
    cells = quantize.assign_cells(h, s, v, CFG)
    phdebug.verify_cell_assignment(h, s, v, cells, CFG)
    counts = quantize.cell_counts(cells.reshape(-1), CFG.num_cells)
    sal = quantize.saliency_f32(
        counts, quantize.OctreeTables.for_config(CFG).s_v_f32, CFG)
    order = quantize.margin_insertion_argsort(sal)
    phdebug.validate_parent_order(counts, order, CFG)

    img8 = np.moveaxis((img * 255).round(), 0, -1).astype(np.uint8)
    rep = ph.get_report(img8)
    phdebug.verify_report(rep)


def test_invariant_checkers_catch_corruption():
    img = phdebug.create_test_rgb(400, 400)
    h, s, v = colorspace.rgb_to_hsv(*(jnp.asarray(c) for c in img))
    cells = np.asarray(quantize.assign_cells(h, s, v, CFG))
    bad = cells.copy()
    bad[0, 0] = (bad[0, 0] + 1) % CFG.num_cells  # misroute one pixel
    with pytest.raises(AssertionError):
        phdebug.verify_cell_assignment(h, s, v, bad, CFG)


@pytest.mark.slow
def test_4k_blur_profile_kernel_snr():
    """Single 4K image: 2-D FFT blur profile + polar bins, kernel-level SNR
    vs the float64 golden (BASELINE.json config #2)."""
    height, width = 2160, 3840
    rng = np.random.default_rng(5)
    # photo-like 1/f luma field
    fy = np.fft.fftfreq(height)[:, None]
    fx = np.fft.rfftfreq(width)[None, :]
    rad = np.sqrt(fy ** 2 + fx ** 2)
    rad[0, 0] = 1
    spec = np.fft.rfft2(rng.standard_normal((height, width))) / rad ** 1.2
    pgm = np.fft.irfft2(spec, s=(height, width))
    pgm = (pgm - pgm.min()) / (pgm.max() - pgm.min())
    dc = pgm.mean()

    golden_mag = gold.normalize_fft(gold.magnitude_fft(pgm - dc))
    golden_bins = gold.blur_profile_from_shape(
        golden_mag, height, width, CFG.radius_partitions,
        CFG.angle_partitions)

    mag = fft.magnitude_fft_normalized(jnp.asarray(pgm - dc, jnp.float32))
    tables = blur.PolarTables.for_shape(height, width, CFG)
    bins = blur.blur_profile_bins(mag, tables, CFG.angle_partitions,
                                  CFG.radius_partitions)
    assert snr_db(golden_bins, np.asarray(bins)) > 40

    ref_vec = gold.vectorize_blur_profile(golden_bins, CFG.fft_streak_thresh,
                                          CFG.magnitude_thresh,
                                          CFG.blur_cutoff_ratio_denom)
    angles, mags = blur.vectorize_blur_profile(bins, CFG)
    for (ra, rm), oa, om in zip(ref_vec, np.asarray(angles),
                                np.asarray(mags)):
        assert ra == int(oa)
        assert abs(rm - float(om)) < 1e-5
