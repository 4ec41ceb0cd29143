"""Pallas TPU kernel for crop-box Laplacian-variance sharpness sums.

reference: src/filtering.c:151-183 (crop -> zero-padded 3x3 Laplacian ->
variance/mean).  The XLA fast path (ops/sharpness.variance_sharpness_batched)
computes ONE shared response plus ring corrections; its fused cost is the
response materialization + separable stencil + box-sum einsums (~5 ms at
33 MP).  This kernel instead evaluates the EXACT masked-crop semantics per
box (the reference's own formulation: stencil over the box-masked image)
and skips, per 8-row tile, every box that does not intersect it — real
images' boxes cover a minority of (tile, box) pairs, so the 10x stencil
replication costs less than it looks, and nothing is ever materialized in
HBM.

Halo handling: the kernel reads THREE vertically adjacent 8-row blocks of
a top/bottom zero-padded image (index maps i-1, i, i+1 on the padded row
axis), giving each tile its 1-row stencil halo without overlapping block
specs.  The 8-row zero pads are semantically free: crop boxes lie inside
the image, so padded rows are outside every box and the masked input is
zero there regardless.

Outputs per (image, box): s1 = sum of the telescoped ring-weighted input
(the exact response-sum identity, ops/sharpness._ring_weight_map — summing
the mixed-sign response directly would cancel catastrophically in f32) and
s2 = sum of the squared masked-crop response, both as (8, 128) lane-partial
accumulators reduced by the caller.  var = s2/n - mean^2 and mean = s1/n
exactly as the XLA fast path computes them.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import MAX_CROP_BOXES

_TROWS = 8  # output rows per tile


def _sharp_kernel(boxes_ref, up_ref, mid_ref, dn_ref, out_ref, *, w: int,
                  h: int):
    """Grid (b, n_tiles).  boxes_ref: (1, 4*MAX_CROP_BOXES) int32 in SMEM
    (flattened [top, bottom, left, right) per box; SMEM blocks are 2-D).  up/mid/dn:
    (1, 8, W) f32 blocks of the 8-row-padded image at padded-row offsets
    (i-1, i, i+1) — mid covers padded rows [8+8t, 16+8t) = image rows
    [8t, 8t+8).  out: (1, 2*MAX_CROP_BOXES, 8, 128) f32 accumulators
    (s1 at row 2k, s2 at row 2k+1 — Mosaic mishandles 5-D blocks)."""
    tile = pl.program_id(1)
    y0 = tile * _TROWS                       # first image row of this tile
    win = jnp.concatenate([up_ref[0], mid_ref[0], dn_ref[0]], axis=0)
    # Window row r holds image row y0 - 8 + r; output rows are the
    # 8-ALIGNED slice [8, 16) (Mosaic rejects misaligned sublane slices,
    # so the stencil runs on the whole 24-row window via pltpu.roll and
    # only the aligned interior is kept — the roll wrap contaminates
    # window rows 0/23 only, two rows outside the kept slice's stencil).
    rows24 = jax.lax.broadcasted_iota(jnp.int32, (3 * _TROWS, w), 0) \
        + (y0 - _TROWS)                      # image row per window row
    cols24 = jax.lax.broadcasted_iota(jnp.int32, (3 * _TROWS, w), 1)
    out8 = slice(_TROWS, 2 * _TROWS)

    @pl.when(tile == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, jnp.float32)

    for k in range(MAX_CROP_BOXES):
        top = boxes_ref[0, 0, 4 * k]
        bot = boxes_ref[0, 0, 4 * k + 1]
        left = boxes_ref[0, 0, 4 * k + 2]
        right = boxes_ref[0, 0, 4 * k + 3]

        @pl.when(jnp.logical_and(bot > y0, top < y0 + _TROWS))
        def _(k=k, top=top, bot=bot, left=left, right=right):
            inside = ((rows24 >= top) & (rows24 < bot)
                      & (cols24 >= left) & (cols24 < right))
            insf = inside.astype(jnp.float32)
            x = win * insf                               # masked crop
            # Zero-padded 3x3 box sum via rolls; lane wrap (columns 0 and
            # W-1) is zeroed explicitly, sublane wrap only touches the
            # discarded window edge rows.
            xl = jnp.where(cols24 == 0, 0.0, pltpu.roll(x, 1, 1))
            xr = jnp.where(cols24 == w - 1, 0.0, pltpu.roll(x, w - 1, 1))
            t = xl + x + xr                              # (24, W)
            box3 = pltpu.roll(t, 1, 0) + t + pltpu.roll(t, 3 * _TROWS - 1, 0)
            resp = (9.0 * x - box3)[out8]                # rows [y0, y0+8)
            ins8 = insf[out8]
            r2 = resp * resp * ins8
            # Telescoped ring weights: 9 - rows_in * cols_in (exact
            # response-sum identity; see ops/sharpness._ring_weight_map).
            # Small-int f32 arithmetic (exact), computed on the FULL
            # 24-row window with only the final product sliced: compares
            # on an offset-SLICED iota crash this Mosaic build
            # ("Check failed: limits[i] <= dim(i)").
            rows_in = ((rows24 >= top + 1).astype(jnp.float32) + 1.0
                       + (rows24 < bot - 1).astype(jnp.float32))
            cols_in = ((cols24 >= left + 1).astype(jnp.float32) + 1.0
                       + (cols24 < right - 1).astype(jnp.float32))
            wmap = 9.0 - rows_in * cols_in
            s1 = (win * wmap * insf)[out8]               # (8, W)
            acc2 = jnp.zeros((_TROWS, 128), jnp.float32)
            acc1 = jnp.zeros((_TROWS, 128), jnp.float32)
            for c0 in range(w // 128):
                sl = slice(c0 * 128, (c0 + 1) * 128)
                acc2 = acc2 + r2[:, sl]
                acc1 = acc1 + s1[:, sl]
            out_ref[0, 2 * k] += acc1
            out_ref[0, 2 * k + 1] += acc2


def sharpness_sums(pgm: jnp.ndarray, boxes: jnp.ndarray):
    """(B, H, W) f32, (B, 10, 4) int32 -> (s1, s2) each (B, 10) f32.

    Requires W % 128 == 0 and H % 8 == 0 (the batched-path caller gates
    on this; other shapes keep the XLA formulation)."""
    b, h, w = pgm.shape
    pad = jnp.pad(pgm, ((0, 0), (_TROWS, _TROWS), (0, 0)))
    n_tiles = h // _TROWS
    blk = lambda off: pl.BlockSpec(           # noqa: E731
        (1, _TROWS, w), lambda bb, i, off=off: (bb, i + off, 0),
        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_sharp_kernel, w=w, h=h),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 1, 4 * MAX_CROP_BOXES),
                         lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.SMEM),
            blk(0), blk(1), blk(2),
        ],
        out_specs=pl.BlockSpec((1, 2 * MAX_CROP_BOXES, _TROWS, 128),
                               lambda bb, i: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 2 * MAX_CROP_BOXES, _TROWS, 128),
                                       jnp.float32),
    )(boxes.reshape(b, 1, 4 * MAX_CROP_BOXES), pad, pad, pad)
    sums = jnp.sum(out, axis=(2, 3)).reshape(b, MAX_CROP_BOXES, 2)
    return sums[..., 0], sums[..., 1]


def eligible(h: int, w: int) -> bool:
    return h % _TROWS == 0 and w % 128 == 0
