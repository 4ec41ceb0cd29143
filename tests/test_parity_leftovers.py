"""Parity sweep for the reference's dev-only / off-path utilities.

Each of these exists in the reference but is unused on its report path;
they are implemented here for component completeness (VERDICT round-1
item 10): fft_shift (src/fft_processing.c:111-157), the filtering
alternates sharpness_avg / get_average_sharpness / create_filtered_RGB
(src/filtering.c:58,110,186), pgm2rgb (src/image_processing.c:515),
print_full_report (src/utilities.c:229-256), and the jax_debug_nans
toggle (SURVEY.md §5.2).
"""

from __future__ import annotations

import numpy as np
import pytest

from photohive_dsp_tpu.ops import colorspace, fft, filtering

from .util import structured_image


def test_fft_shift_matches_numpy_fftshift_odd_sizes():
    h, w = 31, 45  # odd x odd: 180-degree rotation == exact symmetry
    rng = np.random.default_rng(0)
    x = rng.standard_normal((h, w))
    half = np.abs(np.fft.rfft2(x)) ** 2
    ours = np.asarray(fft.fft_shift(half))
    golden = np.fft.fftshift(np.abs(np.fft.fft2(x)) ** 2)
    assert ours.shape == (h, 2 * half.shape[1] - 1) == golden.shape
    np.testing.assert_allclose(ours, golden, rtol=1e-5)


def test_fft_shift_even_shape_and_center():
    h, w = 16, 20
    x = np.random.default_rng(1).standard_normal((h, w))
    x -= x.mean()  # kill DC so the max is informative
    x[::2] += 1.0  # strong Nyquist-ish structure; DC still dominates? no:
    x += 10.0      # re-add a big DC so the global max is the DC bin
    half = np.abs(np.fft.rfft2(x)) ** 2
    ours = np.asarray(fft.fft_shift(half))
    assert ours.shape == (h, 2 * half.shape[1] - 1)
    # DC must land dead-center: row h//2, column W2-1.
    r, c = np.unravel_index(np.argmax(ours), ours.shape)
    assert (r, c) == (h // 2, half.shape[1] - 1)


def test_filter_image_matches_naive_correlation():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((9, 11)).astype(np.float32)
    taps = rng.standard_normal((3, 5)).astype(np.float32)
    ours = np.asarray(filtering.filter_image(x, taps))
    golden = np.zeros_like(x)
    fh, fw = taps.shape
    for y in range(9):
        for xx in range(11):
            acc = 0.0
            for fy in range(fh):
                for fx in range(fw):
                    iy, ix = y + fy - fh // 2, xx + fx - fw // 2
                    if 0 <= iy < 9 and 0 <= ix < 11:
                        acc += x[iy, ix] * taps[fy, fx]
            golden[y, xx] = acc
    np.testing.assert_allclose(ours, golden, rtol=1e-4, atol=1e-5)


def test_create_filtered_rgb_and_pgm_roundtrip():
    rgb = structured_image(32, 48).astype(np.float32)
    lap = [[-1, -1, -1], [-1, 8, -1], [-1, -1, -1]]
    out = np.asarray(filtering.create_filtered_rgb(rgb, lap))
    assert out.shape == rgb.shape
    # channel 0 must equal the single-channel op
    np.testing.assert_allclose(
        out[0], np.asarray(filtering.filter_image(rgb[0], lap)),
        rtol=1e-5, atol=1e-6)
    rgb3 = np.asarray(colorspace.pgm_to_rgb(rgb[0]))
    assert rgb3.shape == (3,) + rgb[0].shape
    assert (rgb3[0] == rgb3[1]).all() and (rgb3[1] == rgb3[2]).all()


def test_sharpness_avg_threshold_semantics():
    resp = np.array([0.1, 0.3, 0.5, -2.0], np.float32)
    # mean of the values strictly above 0.2 (reference src/filtering.c:64)
    assert np.asarray(filtering.sharpness_avg(resp)) == pytest.approx(0.4)
    # nothing above threshold -> non-finite, like the reference's 0/0
    empty = np.asarray(filtering.sharpness_avg(
        np.full((4,), -1.0, np.float32)))
    assert not np.isfinite(empty)
    # end-to-end alternate measure is finite on a real image
    avg = np.asarray(filtering.average_sharpness(
        structured_image(64, 64)[0].astype(np.float32)))
    assert np.isfinite(avg)


def test_text_report_layout():
    import photohive_dsp_tpu as ph

    img8 = (structured_image(400, 520, seed=9) * 255).round()
    img8 = np.moveaxis(img8, 0, -1).astype(np.uint8)
    rep = ph.get_report(img8)
    txt = rep.text_report()
    lines = txt.splitlines()
    assert lines[0] == "FULL REPORT:"
    assert lines[1].startswith("Average Saturation: ")
    assert sum(1 for ln in lines if ln.startswith("angle:")) == 72 * 40
    n_palette = sum(1 for ln in lines if "Portion of image" in ln)
    assert n_palette == rep.color_palette.N
    assert lines[-1] == "END OF REPORT."


def test_nan_checks_toggle():
    import jax

    from photohive_dsp_tpu.utils.debug import nan_checks

    try:
        nan_checks(True)
        assert jax.config.jax_debug_nans
    finally:
        nan_checks(False)
    assert not jax.config.jax_debug_nans


def test_crop_pgm_and_crop_image_parity():
    """Standalone crops (reference src/image_processing.c:213-341): exact
    slice, reference argument order (right, left, bottom, top), None on
    out-of-range or negative bounds (the C NULL)."""
    rng = np.random.default_rng(7)
    pgm = rng.random((40, 60)).astype(np.float32)
    got = colorspace.crop_pgm(pgm, right=50, left=10, bottom=30, top=5)
    np.testing.assert_array_equal(np.asarray(got), pgm[5:30, 10:50])
    rgb = rng.random((3, 40, 60)).astype(np.float32)
    got3 = colorspace.crop_image(rgb, 60, 0, 40, 0)  # full-image bounds OK
    np.testing.assert_array_equal(np.asarray(got3), rgb)
    assert colorspace.crop_pgm(pgm, 61, 0, 40, 0) is None   # right > width
    assert colorspace.crop_pgm(pgm, 50, -1, 30, 5) is None  # negative
    assert colorspace.crop_image(rgb, 60, 0, 41, 0) is None  # bottom > h
    import photohive_dsp_tpu as ph
    assert ph.crop_pgm is colorspace.crop_pgm  # public API surface
