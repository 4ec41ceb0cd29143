"""End-to-end full-report parity and API tests."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

import photohive_dsp_tpu as ph
from photohive_dsp_tpu.models.pipeline import jitted_full_report
from . import golden_ref as gold
from .util import snr_db, structured_image


@pytest.fixture(scope="module")
def report_pair():
    img = structured_image(480, 640, seed=5)
    boxes_list = [(40, 200, 60, 300), (250, 470, 300, 620)]
    golden = gold.full_report(img, boxes=boxes_list)

    boxes, valid = ph.set_bounding_boxes(
        [dict(top=t, bottom=b, left=l, right=r) for t, b, l, r in boxes_list])
    fn, tables = jitted_full_report(480, 640, ph.ReportConfig())
    data = fn(jnp.asarray(img, jnp.float32), jnp.asarray(boxes),
              jnp.asarray(valid), tables)
    return golden, data


def test_stats_parity(report_pair):
    golden, data = report_pair
    assert snr_db(golden["rgb_stats"], np.asarray(data.rgb_stats)) > 60
    assert abs(golden["average_saturation"]
               - float(data.average_saturation)) < 1e-4


def test_blur_bins_parity(report_pair):
    golden, data = report_pair
    assert snr_db(golden["blur_bins"], np.asarray(data.blur_bins)) > 35


def test_blur_vectors_parity(report_pair):
    golden, data = report_pair
    ours = list(zip(np.asarray(data.blur_vector_angles).tolist(),
                    np.asarray(data.blur_vector_mags).tolist()))
    for (ra, rm), (oa, om) in zip(golden["blur_vectors"], ours):
        assert ra == oa
        assert abs(rm - om) < 1e-5


def test_sharpness_parity(report_pair):
    golden, data = report_pair
    ours = np.asarray(data.sharpness)[:2]
    # f32 pipeline (incl. f32 rgb2pgm) vs the all-f64 golden; the exact
    # ring-sum mean keeps this to ~1e-6 relative.
    np.testing.assert_allclose(ours, golden["sharpness"], rtol=1e-4)


def test_palette_parity(report_pair):
    """End-to-end palette parity.  f32 vs f64 rgb2hsv legitimately moves a
    small fraction of boundary pixels between cells (the controlled-input
    tests in test_quantize.py pin the quantizer machinery exactly), so the
    comparison here is structural: strongly-overlapping parent sets and
    closely matching per-parent percentages/averages on the common set."""
    golden, data = report_pair
    n = int(data.palette_n)
    ref_ids = list(golden["palette_ids"])
    assert abs(n - len(ref_ids)) <= 2
    ours_ids = np.asarray(data.palette_ids)[:n].tolist()
    common = set(ours_ids) & set(ref_ids)
    jaccard = len(common) / len(set(ours_ids) | set(ref_ids))
    assert jaccard > 0.9
    ref_pct = dict(zip(ref_ids, golden["palette_pct"]))
    ref_hsv = dict(zip(ref_ids, golden["palette_hsv"]))
    our_pct = dict(zip(ours_ids, np.asarray(data.palette_pct)[:n]))
    our_hsv = dict(zip(ours_ids, np.asarray(data.palette_hsv)[:n]))
    for cid in common:
        assert abs(ref_pct[cid] - our_pct[cid]) < 2e-3
        # hue within a degree (modulo wrap), s/v within 1e-2
        dh = abs(ref_hsv[cid][0] - our_hsv[cid][0])
        assert min(dh, 360 - dh) < 1.5
        assert abs(ref_hsv[cid][1] - our_hsv[cid][1]) < 1e-2
        assert abs(ref_hsv[cid][2] - our_hsv[cid][2]) < 1e-2


def test_get_report_and_json():
    img8 = (structured_image(400, 520, seed=9) * 255).round().astype(np.uint8)
    img8 = np.moveaxis(img8, 0, -1)
    rep = ph.get_report(img8)
    assert rep is not None
    js = json.loads(rep.to_json())
    # fixed schema: 9 scalars + 10*2 vectors + 100*4 colors + 10 sharpnesses
    assert len(js) == 9 + 20 + 400 + 10
    assert js["Height"] == 400 and js["Width"] == 520
    assert rep.sharpnesses == []  # no crop boxes -> empty list


def test_input_guards():
    small = np.zeros((100, 100, 3), np.uint8)
    assert ph.get_report(small) is None
    skinny = np.zeros((2001, 400, 3), np.uint8)
    assert ph.get_report(skinny) is None
    wide = np.zeros((400, 2001, 3), np.uint8)
    assert ph.get_report(wide) is None


def test_config_validation_rejects_bad_partitions():
    import pytest

    for bad in (0, -18, 7):
        with pytest.raises(ValueError):
            ph.ReportConfig(h_partitions=bad).validate()
    for field in ("s_partitions", "v_partitions", "radius_partitions",
                  "angle_partitions"):
        with pytest.raises(ValueError):
            ph.ReportConfig(**{field: 0}).validate()
    ph.ReportConfig().validate()  # defaults are valid


def test_downsample_rate_routing():
    """Palette/saturation run on the downsampled image; stats and blur on the
    full-resolution original (reference src/interface.c:40-55)."""
    img = structured_image(480, 640, seed=11)
    golden = gold.full_report(img, downsample_rate=2)
    fn, tables = jitted_full_report(480, 640,
                                    ph.ReportConfig(downsample_rate=2))
    boxes = jnp.zeros((10, 4), jnp.int32)
    valid = jnp.zeros((10,), bool)
    data = fn(jnp.asarray(img, jnp.float32), boxes, valid, tables)
    assert abs(golden["average_saturation"]
               - float(data.average_saturation)) < 1e-4
    assert snr_db(golden["rgb_stats"], np.asarray(data.rgb_stats)) > 60
    n = int(data.palette_n)
    assert n == len(golden["palette_ids"])
