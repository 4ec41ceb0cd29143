"""Visualization suite tests (host-side, no display needed)."""

import numpy as np

import photohive_dsp_tpu as ph
from photohive_dsp_tpu.utils import viz
from .util import structured_image


def _report():
    img8 = np.moveaxis(
        (structured_image(400, 520, seed=9) * 255).round(), 0, -1
    ).astype(np.uint8)
    boxes = ph.set_bounding_boxes([dict(top=40, bottom=200, left=60,
                                        right=300)])
    return ph.get_report(img8, boxes), img8, boxes


def test_palette_image():
    rep, _, _ = _report()
    img = rep.generate_color_palette_image()
    n = len(rep.color_palette.colors)
    per_row = int(np.ceil(np.sqrt(n)))
    assert img.width == per_row * 50
    arr = np.asarray(img)
    # the first block is the top palette color
    r, g, b = rep.color_palette.colors[0]
    center = arr[10, 10]
    assert abs(int(center[0]) - r) <= 1


def test_blur_profile_visual_semantics():
    rep, _, _ = _report()
    bins = np.asarray(rep.blur_profile.bins)
    vis = viz.blur_profile_visual(bins, 400, 520)
    assert vis.shape == (400, 260)
    # corner (0,0): r=0, phi=0 -> phi_bin=(A-1)/2 truncated, r_bin 0
    a = bins.shape[0]
    phi_bin = int((0 + 3.14159265 * 0.5) / 3.14159265 * (a - 1))
    assert vis[0, 0] == bins[phi_bin, 0]
    img = rep.generate_blur_profile_image()
    assert img.size == (260, 400)


def test_frequency_response_plot():
    rep, _, _ = _report()
    from types import SimpleNamespace
    vectors = [SimpleNamespace(angle=35, magnitude=0.4)]
    img = viz.frequency_response_plot(
        vectors, np.asarray(rep.blur_profile.bins), 0.3, 1.2, 2)
    assert img.width > 100 and img.height > 100


def test_report_card():
    rep, img8, boxes = _report()
    card = rep.generate_report_card(image=img8, bounding_boxes=boxes)
    assert card.width > img8.shape[1]
    assert card.height >= img8.shape[0]
