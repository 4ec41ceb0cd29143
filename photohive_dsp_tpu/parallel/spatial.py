"""Spatially-sharded single-image report: rows of one image over the
``spatial`` mesh axis.

This is the image-size scaling axis (the image-DSP analogue of sequence/
context parallelism): every stage of the report runs on row-tiles with the
minimum cross-shard communication —

  * statistics / mean saturation: local partial sums -> psum;
  * color palette: local cell histogram -> psum -> replicated selection
    (tiny, O(C^2)) -> local pixel pass -> psum of the (C, 4) palette sums;
  * crop sharpness: 1-row halo exchange (ppermute) so the 3x3 Laplacian at
    tile boundaries sees its true neighbors; box reductions psum;
  * blur profile: distributed 2-D rFFT — local row rFFT along W, all_to_all
    transpose over the interconnect, column FFT along H, local polar-bin
    partial sums -> psum; normalization max via pmax.

Everything the reference computes per image (src/interface.c:20-94) comes
out bit-identical in exact arithmetic to the single-device path; parity is
enforced by tests on an 8-device CPU mesh.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import ReportConfig
from ..models.pipeline import ReportData
from ..ops import quantize
from ..ops.blur import vectorize_blur_profile
from ..ops.colorspace import downsample_rgb, rgb_to_hsv, rgb_to_pgm
from ..ops.geometry import polar_geometry
from ..ops.quantize import OctreeTables
from .mesh import DATA_AXIS, SPATIAL_AXIS


class ShardedPolarTables(NamedTuple):
    """Per-shard polar gather tables in each shard's local spectrum space."""

    pad_index: np.ndarray    # (n_shards, A*R, Lmax) int32, sentinel = H*Wc
    counts: np.ndarray       # (A*R,) int32 global bin counts
    wc: int                  # columns per shard after the all_to_all


@functools.lru_cache(maxsize=16)
def sharded_polar_tables(height: int, width: int, num_angle_bins: int,
                         num_radius_bins: int, n_shards: int)\
        -> ShardedPolarTables:
    geom = polar_geometry(height, width, num_angle_bins, num_radius_bins)
    wf = geom.fft_width
    wc = -(-wf // n_shards)
    num_bins = num_angle_bins * num_radius_bins
    bin_2d = geom.bin_ids.reshape(height, wf)
    sentinel = np.int32(height * wc)
    per_shard = []
    l_max = 1
    tables = []
    for k in range(n_shards):
        c0, c1 = k * wc, min((k + 1) * wc, wf)
        if c1 <= c0:
            tables.append((np.zeros((num_bins, 0), np.int64), None))
            continue
        ids = bin_2d[:, c0:c1]
        rows, cols = np.nonzero(np.ones_like(ids, dtype=bool))
        flat_local = rows * wc + (cols)  # local layout is (height, wc)
        flat_ids = ids.ravel()
        order = np.argsort(flat_ids, kind="stable")
        counts_k = np.bincount(flat_ids, minlength=num_bins)
        l_max = max(l_max, int(counts_k.max()))
        tables.append((order, (flat_ids, flat_local, counts_k)))
    pad = np.full((n_shards, num_bins, l_max), sentinel, dtype=np.int32)
    for k, (order, extra) in enumerate(tables):
        if extra is None:
            continue
        flat_ids, flat_local, counts_k = extra
        starts = np.zeros(num_bins + 1, np.int64)
        np.cumsum(counts_k, out=starts[1:])
        seg_pos = np.arange(flat_ids.size) - starts[flat_ids[order]]
        pad[k, flat_ids[order], seg_pos] = flat_local[order]
    return ShardedPolarTables(pad_index=pad,
                              counts=geom.bin_counts.astype(np.int32),
                              wc=wc)


def _laplacian_with_halo(masked: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """3x3 Laplacian over row-sharded (stacked) images with halo exchange.

    masked: (K, local_h, W) — K independent masked images (one per crop
    box).  Edge shards receive zeros from ppermute's missing partners, which
    is exactly the reference's zero padding (src/filtering.c:96).
    """
    n = jax.lax.psum(1, axis_name)
    down = [(i, i + 1) for i in range(n - 1)]   # my last row -> next's top
    up = [(i, i - 1) for i in range(1, n)]      # my first row -> prev's bottom
    top_halo = jax.lax.ppermute(masked[:, -1, :], axis_name, down)
    bottom_halo = jax.lax.ppermute(masked[:, 0, :], axis_name, up)
    padded = jnp.concatenate(
        [top_halo[:, None, :], masked, bottom_halo[:, None, :]], axis=1)
    p = jnp.pad(padded, ((0, 0), (0, 0), (1, 1)))
    neigh = (p[:, :-2, :-2] + p[:, :-2, 1:-1] + p[:, :-2, 2:]
             + p[:, 1:-1, :-2] + p[:, 1:-1, 2:]
             + p[:, 2:, :-2] + p[:, 2:, 1:-1] + p[:, 2:, 2:])
    return 8.0 * masked - neigh


def _sharded_sharpness(pgm_local: jnp.ndarray, boxes: jnp.ndarray,
                       boxes_valid: jnp.ndarray, row_offset: jnp.ndarray,
                       axis_name: str) -> jnp.ndarray:
    """variance/mean Laplacian sharpness with boxes spanning shards."""
    local_h, w = pgm_local.shape
    ys = row_offset + jnp.arange(local_h)[:, None]
    xs = jnp.arange(w)[None, :]
    top, bottom = boxes[:, 0], boxes[:, 1]
    left, right = boxes[:, 2], boxes[:, 3]
    inside = ((ys[None] >= top[:, None, None]) & (ys[None] < bottom[:, None, None])
              & (xs[None] >= left[:, None, None]) & (xs[None] < right[:, None, None]))
    insf = inside.astype(pgm_local.dtype)          # (10, lh, W)
    masked = pgm_local[None] * insf
    resp = _laplacian_with_halo(masked, axis_name)
    n = jnp.maximum((bottom - top) * (right - left), 1).astype(pgm_local.dtype)
    s1 = jax.lax.psum(jnp.sum(resp * insf, axis=(1, 2)), axis_name)
    mean = s1 / n
    s2 = jax.lax.psum(
        jnp.sum(jnp.square(resp - mean[:, None, None]) * insf, axis=(1, 2)),
        axis_name)
    var = s2 / n
    safe_mean = jnp.where(mean == 0, 1.0, mean)
    return jnp.where(boxes_valid, var / safe_mean, 0.0)


def _sharded_blur_bins(pgm_local: jnp.ndarray, dc: jnp.ndarray,
                       pad_index_local: jnp.ndarray,
                       counts_global: jnp.ndarray, wc: int, height: int,
                       width: int, cfg: ReportConfig, axis_name: str)\
        -> jnp.ndarray:
    """Distributed 2-D rFFT -> log normalize -> polar bins, psum-merged."""
    n = jax.lax.psum(1, axis_name)
    wf = width // 2 + 1
    x = pgm_local - dc
    spec = jnp.fft.rfft(x, axis=1)                       # (lh, Wf)
    spec = jnp.pad(spec, ((0, 0), (0, wc * n - wf)))
    # transpose: row shards -> column shards over the interconnect
    cols = jax.lax.all_to_all(spec, axis_name, split_axis=1, concat_axis=0,
                              tiled=True)                # (H, wc)
    col_spec = jnp.fft.fft(cols, axis=0)
    mag = jnp.square(jnp.real(col_spec)) + jnp.square(jnp.imag(col_spec))
    mx = jax.lax.pmax(jnp.max(mag), axis_name)
    g_s = 1.0 / (2.0 * jnp.log(jnp.sqrt(mx) + 1.0))
    norm = jnp.where(mag < 1.0, 0.0,
                     jnp.log(jnp.where(mag < 1.0, 1.0, mag)) * g_s)
    flat = jnp.concatenate([norm.reshape(-1), jnp.zeros((1,), norm.dtype)])
    sums = jnp.sum(flat[pad_index_local], axis=1)        # (A*R,)
    sums = jax.lax.psum(sums, axis_name)
    counts = counts_global.astype(norm.dtype)
    means = jnp.where(counts_global > 0, sums / jnp.maximum(counts, 1), 0.0)
    return means.reshape(cfg.angle_partitions, cfg.radius_partitions)


def spatial_report_body(rgb_local: jnp.ndarray, down_local: jnp.ndarray,
                        boxes: jnp.ndarray,
                        boxes_valid: jnp.ndarray,
                        pad_index_local: jnp.ndarray,
                        octree: OctreeTables, counts_global: jnp.ndarray,
                        wc: int, height: int, width: int, cfg: ReportConfig,
                        axis_name: str = SPATIAL_AXIS) -> ReportData:
    """Per-shard body computing the full report for one row-sharded image.

    rgb_local:  (3, H/n, W) full-resolution rows (stats, sharpness, blur).
    down_local: (3, H'/n, W') rows of the decimated image (palette, mean
                saturation); the same array as rgb_local when
                downsample_rate == 1.  The decimation itself happens
                outside the shard_map (its stride-(rate-1) row pick is not
                aligned with row shards), and GSPMD reshards the small
                result.  All outputs are fully reduced (identical on every
                shard of the axis).
    """
    total = height * width
    # static: decimated rows per shard x n_shards x decimated width
    d_total = (down_local.shape[1] * jax.lax.psum(1, axis_name)
               * down_local.shape[2])
    local_h = rgb_local.shape[1]
    idx = jax.lax.axis_index(axis_name)
    row_offset = idx * local_h

    def gmean(x):
        return jax.lax.psum(jnp.sum(x), axis_name) / total

    # stats (two-pass, like the reference reducers)
    means = [gmean(rgb_local[i]) for i in range(3)]
    stds = [jnp.sqrt(gmean(jnp.square(rgb_local[i] - means[i])))
            for i in range(3)]
    stats = jnp.stack(means + stds)

    h, s, v = rgb_to_hsv(down_local[0], down_local[1], down_local[2])
    pgm = rgb_to_pgm(rgb_local[0], rgb_local[1], rgb_local[2])
    s_bar = jax.lax.psum(jnp.sum(s), axis_name) / d_total

    # palette: psum histogram -> replicated selection -> psum pixel sums
    cells = quantize.assign_cells(h, s, v, cfg).reshape(-1)
    counts = jax.lax.psum(quantize.cell_counts(cells, cfg.num_cells),
                          axis_name)
    assign = quantize.parent_assignment(counts, d_total, cfg, octree)
    sums = jax.lax.psum(
        quantize.palette_pixel_sums(h, s, v, cells, assign, cfg, octree),
        axis_name)
    palette = quantize.palette_finalize(sums, assign, d_total, octree)

    sharp = _sharded_sharpness(pgm, boxes, boxes_valid, row_offset,
                               axis_name)

    dc = (stats[0] + stats[1] + stats[2]) / 3.0
    bins = _sharded_blur_bins(pgm, dc, pad_index_local, counts_global, wc,
                              height, width, cfg, axis_name)
    angles, mags = vectorize_blur_profile(bins, cfg)

    return ReportData(
        rgb_stats=stats, average_saturation=s_bar,
        palette_hsv=palette.hsv, palette_pct=palette.percentages,
        palette_n=palette.n_valid, palette_ids=palette.parent_ids,
        sharpness=sharp, blur_bins=bins,
        blur_vector_angles=angles, blur_vector_mags=mags,
    )


@functools.lru_cache(maxsize=8)
def build_spatial_report(mesh: Mesh, height: int, width: int,
                         cfg: ReportConfig):
    """Compiled spatially-sharded single-image report over mesh['spatial'].

    Returns fn(rgb (3,H,W), boxes, valid) -> ReportData (replicated).
    """
    n = mesh.shape[SPATIAL_AXIS]
    if height % n != 0:
        raise ValueError(f"height {height} must divide by spatial={n}")
    if cfg.downsample_rate > 1 and (height // cfg.downsample_rate) % n != 0:
        raise ValueError(
            f"decimated height {height // cfg.downsample_rate} must divide "
            f"by spatial={n}")
    tabs = sharded_polar_tables(height, width, cfg.angle_partitions,
                                cfg.radius_partitions, n)
    octree = OctreeTables.for_config(cfg)
    pad_all = jnp.asarray(tabs.pad_index)
    counts_g = jnp.asarray(tabs.counts)

    def body(rgb_loc, down_loc, boxes, valid, pad_loc, octree_t, counts):
        return spatial_report_body(rgb_loc, down_loc, boxes, valid,
                                   pad_loc[0], octree_t, counts, tabs.wc,
                                   height, width, cfg, SPATIAL_AXIS)

    shard_fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(None, SPATIAL_AXIS, None), P(None, SPATIAL_AXIS, None),
                  P(), P(), P(SPATIAL_AXIS), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    @jax.jit
    def run(rgb, boxes, valid):
        # Decimation happens at jit level: its stride-(rate-1) row pick is
        # not shard-aligned, so GSPMD inserts the (tiny) reshard collective.
        down = downsample_rgb(rgb, cfg.downsample_rate)
        return shard_fn(rgb, down, boxes, valid, pad_all, octree, counts_g)

    return run


@functools.lru_cache(maxsize=8)
def build_dp_spatial_report(mesh: Mesh, batch: int, height: int, width: int,
                            cfg: ReportConfig):
    """Full multi-chip step: batch over ``data`` x rows over ``spatial``.

    Returns fn(rgb (B,3,H,W), boxes (B,10,4), valid (B,10)) -> ReportData
    with leading batch dim (sharded over data, replicated over spatial).
    """
    nd = mesh.shape[DATA_AXIS]
    ns = mesh.shape[SPATIAL_AXIS]
    if batch % nd != 0:
        raise ValueError(f"batch {batch} must divide by data={nd}")
    if height % ns != 0:
        raise ValueError(f"height {height} must divide by spatial={ns}")
    if cfg.downsample_rate > 1 and (height // cfg.downsample_rate) % ns != 0:
        raise ValueError(
            f"decimated height {height // cfg.downsample_rate} must divide "
            f"by spatial={ns}")
    tabs = sharded_polar_tables(height, width, cfg.angle_partitions,
                                cfg.radius_partitions, ns)
    octree = OctreeTables.for_config(cfg)
    pad_all = jnp.asarray(tabs.pad_index)
    counts_g = jnp.asarray(tabs.counts)

    def body(rgb_loc, down_loc, boxes, valid, pad_loc, octree_t, counts):
        def one(rgb_i, down_i, boxes_i, valid_i):
            return spatial_report_body(rgb_i, down_i, boxes_i, valid_i,
                                       pad_loc[0], octree_t, counts,
                                       tabs.wc, height, width, cfg,
                                       SPATIAL_AXIS)
        return jax.vmap(one)(rgb_loc, down_loc, boxes, valid)

    shard_fn = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(DATA_AXIS, None, SPATIAL_AXIS, None),
                  P(DATA_AXIS, None, SPATIAL_AXIS, None),
                  P(DATA_AXIS), P(DATA_AXIS), P(SPATIAL_AXIS), P(), P()),
        out_specs=P(DATA_AXIS),
        check_vma=False,
    )

    @jax.jit
    def run(rgb, boxes, valid):
        down = jax.vmap(
            lambda x: downsample_rgb(x, cfg.downsample_rate))(rgb)
        return shard_fn(rgb, down, boxes, valid, pad_all, octree, counts_g)

    return run
