"""Laplacian-variance sharpness over salient-character crop boxes.

reference: src/filtering.c:151-183 — for each crop box, crop the grayscale
image, run the zero-padded 3x3 Laplacian over the *crop*, and report
variance(response)/mean(response) ("scale-invariant" sharpness).

TPU-native formulation: instead of dynamic-shaped crops (which break XLA's
static-shape compilation), each box is handled as a masked full-image pass:
zero the image outside the box, run the Laplacian everywhere, and reduce with
the box mask.  Because the crop is zeroed outside its bounds, the stencil at
crop borders sees exactly the zero padding the reference's crop-then-filter
produces, so the response values inside the box match bit-for-bit in exact
arithmetic.  The ``MAX_CROP_BOXES``-slot box tensor is vmapped, giving a
fixed-shape (10,) output with a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .filtering import laplacian_3x3


def _one_box_sharpness(pgm: jnp.ndarray, box: jnp.ndarray,
                       valid: jnp.ndarray) -> jnp.ndarray:
    """box = [top, bottom, left, right); returns var/mean of the response."""
    h, w = pgm.shape
    top, bottom, left, right = box[0], box[1], box[2], box[3]
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    inside = ((ys >= top) & (ys < bottom) & (xs >= left) & (xs < right))
    insf = inside.astype(pgm.dtype)
    resp = laplacian_3x3(pgm * insf)
    n = jnp.maximum((bottom - top) * (right - left), 1).astype(pgm.dtype)
    mean = jnp.sum(resp * insf) / n
    var = jnp.sum(jnp.square(resp - mean) * insf) / n
    safe_mean = jnp.where(mean == 0, 1.0, mean)
    return jnp.where(valid, var / safe_mean, 0.0)


def variance_sharpness(pgm: jnp.ndarray, boxes: jnp.ndarray,
                       boxes_valid: jnp.ndarray) -> jnp.ndarray:
    """Sharpness per crop box.

    pgm:         (H, W) grayscale image (full resolution, pre-DC-removal —
                 the reference computes sharpness before remove_dc_bias
                 mutates the shared buffer, src/interface.c:73 vs :79).
    boxes:       (MAX_CROP_BOXES, 4) int32 [top, bottom, left, right).
    boxes_valid: (MAX_CROP_BOXES,) bool.
    Returns (MAX_CROP_BOXES,) f32, zeros in invalid slots.
    """
    return jax.vmap(_one_box_sharpness, in_axes=(None, 0, 0))(
        pgm, boxes, boxes_valid
    )
