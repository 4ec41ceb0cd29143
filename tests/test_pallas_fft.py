"""Interpret-mode coverage for the Pallas 2-D FFT magnitude kernels.

Pins the kernel logic (lane/sublane DIF ladders, pruned group DFT, tile
FFT, twiddle tables, scramble maps) against numpy's float64 rfft2 on CPU;
Mosaic-compiler behavior is validated on-chip by tools/tpu_parity_check.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from photohive_dsp_tpu.config import ReportConfig
from photohive_dsp_tpu.ops import fft as fft_ops
from photohive_dsp_tpu.ops import pallas_fft

from .util import snr_db


def _unscramble(mag, height, width):
    """(B, S, H, 128) scrambled -> (B, H, W//2+1) true layout (numpy)."""
    b = mag.shape[0]
    s = mag.shape[1]
    flat = mag.transpose(0, 2, 1, 3).reshape(b, height, s * 128)
    true_row, true_col = pallas_fft.scramble_maps(height, width)
    out = np.zeros((b, height, width // 2 + 1), mag.dtype)
    keep = true_col <= width // 2
    inv_row = np.argsort(true_row)
    out[:, :, :] = flat[:, inv_row][:, :, keep][
        :, :, np.argsort(true_col[keep])]
    return out


@pytest.mark.parametrize("height,width", [
    (240, 384), (96, 256),
    # widened eligibility (round 5): Q=36 > _Q_DIRECT_MAX exercises the
    # group-FFT row combine (the 8K enabler; 8K itself is chip-gated in
    # tools/tpu_parity_check); M=7 and M=13 exercise the new prime
    # radices (M=91=7*13 verified once by hand: 134.3 dB, but costs
    # ~3 min of interpret time — too slow for default CI)
    (40, 4608), (56, 384), (104, 256),
])
def test_magnitude2_scrambled_matches_numpy(height, width):
    assert pallas_fft.eligible(height, width)
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, height, width)).astype(np.float32) * 50.0
    plan = pallas_fft.FftPlan.for_shape(height, width)
    with pltpu.force_tpu_interpret_mode():
        mag = np.asarray(pallas_fft.magnitude2_scrambled(
            jnp.asarray(x), plan))
    got = _unscramble(mag, height, width)
    want = np.abs(np.fft.rfft2(x.astype(np.float64), axes=(1, 2))) ** 2
    assert snr_db(want, got) > 90


def test_factored_column_twiddles_match_numpy(monkeypatch):
    """The tall-strip factored twiddle route (W_H^{e*u} as the product
    of W_M^{e*u1} and W_H^{e*u0} factor pages) forced onto a small
    shape: same exactness class as the direct table.  On real shapes it
    engages above _COL_FACTOR_H=2560 (8K), where the direct (2, H, 128)
    table alone blew the col kernel's scoped-VMEM budget."""
    monkeypatch.setattr(pallas_fft, "_COL_FACTOR_H", 64)
    height, width = 120, 256   # fresh shape: for_shape is lru_cached
    plan = pallas_fft.FftPlan.for_shape(height, width)
    assert plan.col_factored and plan.twcol_b is not None
    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, height, width)).astype(np.float32)
    with pltpu.force_tpu_interpret_mode():
        mag = np.asarray(pallas_fft.magnitude2_scrambled(
            jnp.asarray(x), plan))
    got = _unscramble(mag, height, width)
    want = np.abs(np.fft.rfft2(x.astype(np.float64), axes=(1, 2))) ** 2
    assert snr_db(want, got) > 90


def test_scrambled_max_matches_true_max():
    """The normalize gain G_s depends on the spectrum max; the scrambled
    layout's extra mirrored lanes must not change it."""
    height, width = 240, 384
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1, height, width)).astype(np.float32) * 10.0
    plan = pallas_fft.FftPlan.for_shape(height, width)
    with pltpu.force_tpu_interpret_mode():
        mag = np.asarray(pallas_fft.magnitude2_scrambled(
            jnp.asarray(x), plan))
    true = np.abs(np.fft.rfft2(x[0].astype(np.float64))) ** 2
    assert abs(mag.max() - true.max()) / true.max() < 1e-4


def test_scrambled_polar_bins_match_xla_path():
    """Full blur-bin chain: scrambled kernel + permuted tables vs the XLA
    rfft2 + true tables."""
    from photohive_dsp_tpu.ops.blur import (PolarTables,
                                            blur_profile_bins_batched)

    height, width = 240, 384
    cfg = ReportConfig()
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, height, width)).astype(np.float32) * 20.0
    xj = jnp.asarray(x)

    plan = pallas_fft.FftPlan.for_shape(height, width)
    ptab = pallas_fft.scrambled_polar_tables(height, width, cfg)
    with pltpu.force_tpu_interpret_mode():
        mag_n = pallas_fft.magnitude_fft_scrambled_normalized(xj, plan)
        bins_fast = np.asarray(blur_profile_bins_batched(
            mag_n, ptab, cfg.angle_partitions, cfg.radius_partitions,
            use_pallas=True))

    true_tab = PolarTables.for_shape(height, width, cfg)
    mag_ref = jax.vmap(fft_ops.magnitude_fft_normalized)(xj)
    bins_ref = np.asarray(blur_profile_bins_batched(
        mag_ref, true_tab, cfg.angle_partitions, cfg.radius_partitions,
        use_pallas=False))
    assert snr_db(bins_ref, bins_fast) > 60
    assert np.abs(bins_fast - bins_ref).max() < 1e-4


def test_full_report_batched_scrambled_fft_path():
    """Pipeline-level: the scrambled-FFT report matches the XLA-FFT report
    (identical palette/stats/sharpness; blur parts within FFT rounding)."""
    from photohive_dsp_tpu.models.pipeline import (ReportTables,
                                                   empty_boxes,
                                                   full_report_batched)

    height, width = 240, 384
    cfg = ReportConfig()
    rng = np.random.default_rng(21)
    rgb = jnp.asarray(rng.random((2, 3, height, width)), jnp.float32)
    boxes, valid = empty_boxes()
    boxes = jnp.broadcast_to(boxes, (2,) + boxes.shape)
    valid = jnp.broadcast_to(valid, (2,) + valid.shape)

    t_fast = ReportTables.build(height, width, cfg, scrambled_fft=True)
    t_ref = ReportTables.build(height, width, cfg, scrambled_fft=False)
    with pltpu.force_tpu_interpret_mode():
        fast = full_report_batched(rgb, boxes, valid, t_fast, cfg,
                                   use_pallas=True)
        ref = full_report_batched(rgb, boxes, valid, t_ref, cfg,
                                  use_pallas=True)
    assert np.array_equal(np.asarray(fast.palette_pct),
                          np.asarray(ref.palette_pct))
    assert np.array_equal(np.asarray(fast.rgb_stats),
                          np.asarray(ref.rgb_stats))
    assert snr_db(np.asarray(ref.blur_bins), np.asarray(fast.blur_bins)) > 60
    assert np.array_equal(np.asarray(fast.blur_vector_angles),
                          np.asarray(ref.blur_vector_angles))
    assert np.abs(np.asarray(fast.blur_vector_mags)
                  - np.asarray(ref.blur_vector_mags)).max() < 1e-4


def test_fused_lognorm_bins_match_unfused():
    """blur_bins_scrambled_lognorm (in-kernel log gate, deferred G_s) vs
    the normalize-then-bin route — reassociation-level agreement."""
    from photohive_dsp_tpu.ops.blur import blur_profile_bins_batched

    height, width = 240, 384
    cfg = ReportConfig()
    rng = np.random.default_rng(17)
    x = rng.standard_normal((2, height, width)).astype(np.float32) * 20.0
    xj = jnp.asarray(x)
    plan = pallas_fft.FftPlan.for_shape(height, width)
    ptab = pallas_fft.scrambled_polar_tables(height, width, cfg)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(pallas_fft.blur_bins_scrambled_lognorm(
            xj, plan, ptab, cfg.angle_partitions, cfg.radius_partitions))
        mag_n = pallas_fft.magnitude_fft_scrambled_normalized(xj, plan)
        unfused = np.asarray(blur_profile_bins_batched(
            mag_n, ptab, cfg.angle_partitions, cfg.radius_partitions,
            use_pallas=True))
    assert snr_db(unfused, fused) > 80
    assert np.abs(fused - unfused).max() < 1e-5


def test_fused_lognorm_black_frame_zero_bins():
    """A zero spectrum (black/uniform frame after DC removal) must yield
    all-zero bins, not NaN: mx==0 makes the naive gain 1/(2*log(1)) = inf
    and inf * 0-sums = NaN.  Reference C (src/fft_processing.c:192-199)
    and the unfused path both gate every value <1 to 0."""
    height, width = 240, 384
    cfg = ReportConfig()
    x = jnp.zeros((2, height, width), jnp.float32)
    plan = pallas_fft.FftPlan.for_shape(height, width)
    ptab = pallas_fft.scrambled_polar_tables(height, width, cfg)
    with pltpu.force_tpu_interpret_mode():
        fused = np.asarray(pallas_fft.blur_bins_scrambled_lognorm(
            x, plan, ptab, cfg.angle_partitions, cfg.radius_partitions))
    assert np.isfinite(fused).all()
    assert np.array_equal(fused, np.zeros_like(fused))
