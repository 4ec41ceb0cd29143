"""On-chip incremental cost probe of the batched sharpness fast path.

variance_sharpness_batched's fast() branch costs ~18-27 ms of the fused
batch-16 1080p program (tools/ablate_stages.py) — far above its ~1.3 ms
of algorithmic HBM traffic.  Stages:

  lap     shared Laplacian response + square
  masks   row/col box masks
  s2      resp^2 box sums (einsum pair, HIGHEST)
  ring    per-box ring corrections
  s1      telescoped border-ring response sums (3 einsum pairs)
  all     the real fast() (adds the var/mean arithmetic)

Also A/Bs the einsum precision strategy: HIGHEST (production) vs a 3-term
bf16 split of the value operand at DEFAULT precision (exact products
against 0/1 masks, ~2^-24 sums — the palette kernels' trick).

Usage: python tools/sharpness_probe.py [H W B]
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp

from photohive_dsp_tpu.ops.filtering import laplacian_3x3
from photohive_dsp_tpu.ops.sharpness import (_box_ring_terms,
                                             variance_sharpness_batched)

HI = jax.lax.Precision.HIGHEST


def _masks(boxes, h, w, dtype):
    t, b = boxes[..., 0], boxes[..., 1]
    l, r = boxes[..., 2], boxes[..., 3]
    hidx = jnp.arange(h)[None, None, :]
    widx = jnp.arange(w)[None, None, :]
    rowm = (hidx >= t[..., None]) & (hidx < b[..., None])
    colm = (widx >= l[..., None]) & (widx < r[..., None])
    return rowm.astype(dtype), colm.astype(dtype)


def boxsum_hi(a, row_mask, col_mask):
    per_row = jnp.einsum("bhw,bkw->bkh", a, col_mask, precision=HI)
    return jnp.einsum("bkh,bkh->bk", per_row, row_mask, precision=HI)


def boxsum_split(a, row_mask, col_mask):
    """3-term bf16 split of the value operand, DEFAULT precision: products
    against the 0/1 masks are exact per term, sums ~2^-24 — 1 MXU pass per
    term instead of HIGHEST's 6."""
    hi_t = a.astype(jnp.bfloat16).astype(jnp.float32)
    r = a - hi_t
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    lo = r - mid
    out = 0.0
    for term in (hi_t, mid, lo):
        per_row = jnp.einsum("bhw,bkw->bkh", term, col_mask)
        out = out + jnp.einsum("bkh,bkh->bk", per_row, row_mask,
                               precision=HI)
    return out


def build(stage, h, w, boxsum):
    def fn(pgm, boxes, boxes_valid):
        bsz = pgm.shape[0]
        resp = jax.vmap(laplacian_3x3)(pgm)
        resp2 = resp * resp
        if stage == "lap":
            return resp2[:, :8, :8].sum(axis=(1, 2))
        rm, cm = _masks(boxes, h, w, pgm.dtype)
        if stage == "masks":
            return resp2[:, :8, :8].sum(axis=(1, 2)) \
                + rm.sum(axis=(1, 2)) + cm.sum(axis=(1, 2))[..., None][:, 0]
        s2 = boxsum(resp2, rm, cm)
        if stage == "s2":
            return s2.sum(axis=1)
        pgm_pad = jnp.pad(pgm, ((0, 0), (1, 1), (1, 1)))
        ring = jax.vmap(lambda pp, rr, bx: jax.vmap(
            lambda one: _box_ring_terms(pp, rr, one))(bx))(pgm_pad, resp,
                                                           boxes)
        s2r = s2 + ring
        if stage == "ring":
            return s2r.sum(axis=1)
        hidx = jnp.arange(h)[None, None, :]
        widx = jnp.arange(w)[None, None, :]
        t, b = boxes[..., 0], boxes[..., 1]
        l, r = boxes[..., 2], boxes[..., 3]
        alpha = rm * ((hidx - 1 < t[..., None]).astype(pgm.dtype)
                      + (hidx + 1 >= b[..., None]).astype(pgm.dtype))
        beta = cm * ((widx - 1 < l[..., None]).astype(pgm.dtype)
                     + (widx + 1 >= r[..., None]).astype(pgm.dtype))
        s1 = (3.0 * boxsum(pgm, alpha, cm) + 3.0 * boxsum(pgm, rm, beta)
              - boxsum(pgm, alpha, beta))
        n = jnp.maximum((b - t) * (r - l), 1).astype(pgm.dtype)
        mean = s1 / n
        var = s2r / n - mean * mean
        return jnp.where(boxes_valid, var / mean, 0.0).sum(axis=1)

    return jax.jit(fn)


def main():
    h, w, bsz = 1080, 1920, 16
    if len(sys.argv) >= 4:
        h, w, bsz = map(int, sys.argv[1:4])
    rng = np.random.default_rng(0)
    pgm = jax.device_put(rng.random((bsz, h, w)).astype(np.float32))
    boxes = np.zeros((bsz, 10, 4), np.int32)
    boxes[:, 0] = (100, 500, 200, 900)
    boxes[:, 1] = (400, 900, 600, 1500)
    valid = np.zeros((bsz, 10), bool)
    valid[:, :2] = True
    dboxes, dvalid = jax.device_put(boxes), jax.device_put(valid)

    def measure(fn, *args):
        np.asarray(fn(*args))
        ts = []
        for _ in range(8):
            t0 = time.perf_counter()
            np.asarray(fn(*args))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    prev = None
    for stage in ("lap", "masks", "s2", "ring", "s1"):
        t = measure(build(stage, h, w, boxsum_hi), pgm, dboxes, dvalid)
        d = "" if prev is None else f"   delta {1e3*(t-prev):+7.1f} ms"
        print(f"  {stage:<6} {t*1e3:7.1f} ms{d}", flush=True)
        prev = t

    # Precision-strategy A/B on the full stage.
    t_hi = measure(build("s1", h, w, boxsum_hi), pgm, dboxes, dvalid)
    t_sp = measure(build("s1", h, w, boxsum_split), pgm, dboxes, dvalid)
    out_hi = np.asarray(build("s1", h, w, boxsum_hi)(pgm, dboxes, dvalid))
    out_sp = np.asarray(build("s1", h, w, boxsum_split)(pgm, dboxes, dvalid))
    rel = np.abs(out_sp - out_hi).max() / max(1e-9, np.abs(out_hi).max())
    print(f"  full HIGHEST {t_hi*1e3:7.1f} ms | split-DEFAULT "
          f"{t_sp*1e3:7.1f} ms | rel diff {rel:.2e}", flush=True)

    # Production function for reference.
    fn = jax.jit(variance_sharpness_batched)
    t = measure(fn, pgm, dboxes, dvalid)
    print(f"  production variance_sharpness_batched {t*1e3:7.1f} ms",
          flush=True)


if __name__ == "__main__":
    main()
