"""Polar blur profile and directional blur-vector extraction.

reference: src/blur_profile.c
  * calculate_blur_profile (:34-126): per-FFT-pixel (angle, radius) binning
    with scatter accumulation, then per-bin mean.
  * vectorize_blur_profile (:324-416): per-angle low-band totals, trailing
    circular 5-tap smoothing, local-maxima streak detection, and conversion
    to <=10 (angle, magnitude) blur vectors.

TPU-native binning: the bin id of every FFT pixel depends only on the image
shape (see ops/geometry.py), so the scatter becomes a *static gather*: pixel
values are gathered into per-bin padded rows (zeros past each bin's count)
and tree-summed along the row — no scatter, no atomics, exact per-bin means.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import NUM_BLUR_VECTORS, ReportConfig
from .filtering import trailing_circular_box
from .geometry import polar_geometry


class PolarTables(NamedTuple):
    """Device-resident polar binning constants (see geometry.PolarGeometry)."""

    pad_index: jnp.ndarray   # (A*R, Lmax) int32 (gather path, XLA/CPU)
    bin_counts: jnp.ndarray  # (A*R,) int32
    bin_ids: jnp.ndarray     # (H * fft_width,) int32 (Pallas MXU path)

    @classmethod
    def for_shape(cls, height: int, width: int, cfg: ReportConfig)\
            -> "PolarTables":
        geom = polar_geometry(height, width, cfg.angle_partitions,
                              cfg.radius_partitions)
        return cls(pad_index=jnp.asarray(geom.pad_index),
                   bin_counts=jnp.asarray(geom.bin_counts),
                   bin_ids=jnp.asarray(geom.bin_ids))


def blur_profile_bins(mag_norm: jnp.ndarray, tables: PolarTables,
                      num_angle_bins: int, num_radius_bins: int)\
        -> jnp.ndarray:
    """Mean normalized FFT magnitude per (angle, radius) bin.

    mag_norm: (H, W//2+1) normalized magnitude.
    Returns (A, R) f32 bins; empty bins are 0 (reference
    src/blur_profile.c:106-116).
    """
    flat = jnp.concatenate(
        [mag_norm.reshape(-1), jnp.zeros((1,), mag_norm.dtype)]
    )
    padded = flat[tables.pad_index]            # (A*R, Lmax), zeros past count
    sums = jnp.sum(padded, axis=1)
    counts = tables.bin_counts.astype(mag_norm.dtype)
    means = jnp.where(tables.bin_counts > 0, sums / jnp.maximum(counts, 1), 0.0)
    return means.reshape(num_angle_bins, num_radius_bins)


def blur_profile_bins_batched(mag_norm: jnp.ndarray, tables: PolarTables,
                              num_angle_bins: int, num_radius_bins: int,
                              use_pallas: bool = False) -> jnp.ndarray:
    """Batched bin means: (B, H, W//2+1) -> (B, A, R).

    The Pallas path contracts the shared one-hot bin map against the whole
    batch on the MXU (ops/pallas_kernels.polar_bin_sums); the XLA path is
    the vmapped static gather."""
    b = mag_norm.shape[0]
    num_bins = num_angle_bins * num_radius_bins
    if use_pallas:
        from . import pallas_kernels as pk
        sums = pk.polar_bin_sums(mag_norm.reshape(b, -1), tables.bin_ids,
                                 num_bins)
        counts = tables.bin_counts.astype(mag_norm.dtype)
        means = jnp.where(tables.bin_counts[None, :] > 0,
                          sums / jnp.maximum(counts, 1.0)[None, :], 0.0)
        return means.reshape(b, num_angle_bins, num_radius_bins)
    return jax.vmap(
        lambda m: blur_profile_bins(m, tables, num_angle_bins,
                                    num_radius_bins))(mag_norm)


def vectorize_blur_profile(bins: jnp.ndarray, cfg: ReportConfig):
    """Extract <=10 blur vectors (reference src/blur_profile.c:324-416).

    Returns (angles int32 (10,), magnitudes f32 (10,)).  Unused slots are
    zero, exactly like the reference's calloc'd 10-slot group (:297-302).
    """
    a = cfg.angle_partitions
    r = cfg.radius_partitions
    radius_cutoff = r // cfg.blur_cutoff_ratio_denom

    tot = jnp.sum(bins[:, :radius_cutoff], axis=1)          # (A,)
    avg = jnp.sum(tot) / a
    smooth = trailing_circular_box(tot, 5)

    # Local maxima with circular neighbors: the reference's boundary cases
    # (:360-379) coincide with roll-based neighbor comparisons.
    left = jnp.roll(smooth, 1)
    right = jnp.roll(smooth, -1)
    is_max = (smooth > left) & (smooth > right) \
        & (smooth > avg * cfg.fft_streak_thresh)

    # Everything below is computed for *every* angle (vectorized — no sorts
    # or data-dependent gathers; TPU-friendly), then the first 10 maxima in
    # ascending angle order are selected into the 10 output slots (the
    # reference appends i=0, interior ascending, then i=A-1 — ascending).
    rank = jnp.cumsum(is_max) - 1                           # slot per maxima
    keep = is_max & (rank < NUM_BLUR_VECTORS)

    # Re-index the angle (:387): cur[i] = bins[(i + A//2) % A] — a static
    # circular roll; vet against the global average (:392-400).
    cur = jnp.roll(bins, -(a // 2), axis=0)                 # (A, R)
    blur_avg = jnp.sum(cur[:, :radius_cutoff], axis=1)
    suppressed = blur_avg > avg

    # Magnitude: first radius bin below the magnitude threshold (:403-412).
    below = cur < cfg.magnitude_thresh                      # (A, R)
    first_below = jnp.where(jnp.any(below, axis=1),
                            jnp.argmax(below, axis=1), r)
    magnitude = first_below.astype(bins.dtype) / float(r)

    # Angle in degrees (:413).  The C expression
    # (int)(180 * ((float)idx / (float)A) - 90) rounds in float32 *without*
    # FMA contraction — e.g. idx=50, A=72 gives 34.99999 -> 34, not 35.  XLA
    # may fuse the multiply-subtract, so the table is precomputed on host
    # with C's exact rounding, indexed by the rolled angle per slot.
    angle_idx = (np.arange(a) + a // 2) % a
    table = np.trunc(
        np.float32(180) * (angle_idx.astype(np.float32) / np.float32(a))
        - np.float32(90)
    ).astype(np.int32)

    live = keep & ~suppressed
    angles_a = jnp.where(live, jnp.asarray(table), 0)       # (A,) int32
    mags_a = jnp.where(live, magnitude, 0.0)

    # Scatter the <=10 kept maxima into their slots with a (10, A) one-hot
    # selection (slot k <- the angle whose maxima-rank is k).
    sel = (rank[None, :] == jnp.arange(NUM_BLUR_VECTORS)[:, None]) \
        & keep[None, :]                                     # (10, A)
    angles = jnp.sum(jnp.where(sel, angles_a[None, :], 0), axis=1,
                     dtype=jnp.int32)
    mags = jnp.sum(jnp.where(sel, mags_a[None, :], 0.0), axis=1)
    return angles, mags
