"""C-wide palette kernel: the A/B alternative to the candidate-table one.

The candidate-table kernel (pallas_kernels._palette_kernel) gathers each
pixel's tie-candidate tables through a (12*q_pad, C)x(C, CHUNK) one-hot
GEMM — 480 output rows at q_pad=40.  This variant instead gathers only the
pixel's *allowed-candidate mask* row, a (C, C)x(C, CHUNK) GEMM (112 rows:
~4x fewer MXU MACs), and runs the distance/argmin math C-wide against the
per-image center columns, which are shard-constant and need no per-pixel
gather at all.  The trade: ~2.8x more VPU distance work (C=112 rows vs
q_pad=40).  Which side wins depends on the VPU:MXU balance of the chip —
`PHOTOHIVE_PALETTE_KERNEL=cwide` selects this kernel so the two can be
A/B-measured on silicon (tools/ablate_stages.py); interpret-mode parity is
pinned in tests/test_pallas_interpret.py either way.

Tie semantics are identical to the XLA path (reference
src/color_quantization.c:376-451): distances use the exact f32 op sequence
of the XLA pixel-pass distance (quantize.palette_pixel_sums), candidates are masked by the pixel's
``allowed`` row, and the first minimum in valid (saliency) order wins.
Both GEMMs are exact in a single DEFAULT-precision bf16 pass: the gather
contracts 0/1 against 0/1 with at most one nonzero term per output, and
the sums GEMM contracts 0/1 one-hots against bf16-split value rows (see
pallas_kernels._trunc_split3 for the argument).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (_BIG, _CHUNK, _ROWS, _cell_ids_row,
                             _recombine_split_sums, _shape_pixels, _split3)


def _palette_kernel_cwide(h_ref, s_ref, v_ref, allowedT_ref,
                          ch_ref, cs_ref, cv_ref, out_ref, *,
                          num_cells: int, cfg):
    step = pl.program_id(1)
    c = num_cells
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, _CHUNK), 0)
    kf = iota_c.astype(jnp.float32)                       # row index == k
    # Center columns in valid order, shard-constant: (C, 1) slices of the
    # lane-broadcast tables ((C, 1) *arrays* hang Mosaic — see the
    # cell_counts note — but an in-register slice is fine).
    ch = ch_ref[0][:, 0:1]                                # (C, 1)
    cs = cs_ref[0][:, 0:1]
    cv = cv_ref[0][:, 0:1]
    off_col = jnp.float32(180.0) - ch                     # (C, 1)
    split3 = _split3

    def row(j, acc):
        hrow = h_ref[0, pl.ds(j, 1), :]                   # (1, CHUNK)
        srow = s_ref[0, pl.ds(j, 1), :]
        vrow = v_ref[0, pl.ds(j, 1), :]
        in_img = (hrow >= 0.0).astype(jnp.float32)        # (1, CHUNK)
        crow = _cell_ids_row(jnp.maximum(hrow, 0.0), srow, vrow, cfg)
        oh_c = (iota_c == crow).astype(jnp.float32)       # (C, CHUNK)
        # Gather each pixel's allowed-mask row: one exact single-pass GEMM
        # (0/1 x 0/1, one term per output element).
        mask = jax.lax.dot_general(
            allowedT_ref[0], oh_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (C, CHUNK)
        # Distance to every valid-order center; identical f32 ops to the XLA
        # pixel pass (quantize.palette_pixel_sums) so ties break
        # bit-identically.
        hd = jnp.abs(hrow - ch)                           # (C, CHUNK)
        hd = jnp.where(hd > 180.0, 360.0 - hd, hd) * jnp.float32(1 / 360.0)
        sd = srow - cs
        vd = vrow - cv
        d = hd * hd + sd * sd + vd * vd
        dm = jnp.where(mask > 0.5, d, jnp.float32(_BIG))
        minv = jnp.min(dm, axis=0, keepdims=True)
        iskmin = dm == minv
        # First minimum in valid order == smallest row index k.
        kstar = jnp.min(jnp.where(iskmin, kf, jnp.float32(c)), axis=0,
                        keepdims=True)
        chosen = jnp.logical_and(iskmin, kf == kstar)
        off = jnp.sum(jnp.where(chosen, off_col, 0.0), axis=0,
                      keepdims=True)
        kfin = jnp.where(in_img > 0.5, kstar, jnp.float32(c))
        oh_k = (iota_c == kfin.astype(jnp.int32)).astype(jnp.float32)
        temp = hrow + off
        temp = jnp.where(temp > 360.0, temp - 360.0,
                         jnp.where(temp < 0.0, temp + 360.0, temp))
        t1, t2, t3 = split3(temp * in_img)
        s1, s2, s3 = split3(srow * in_img)
        v1, v2, v3 = split3(vrow * in_img)
        vals = jnp.concatenate(
            [in_img, t1, t2, t3, s1, s2, s3, v1, v2, v3,
             jnp.zeros((6, _CHUNK), jnp.float32)], axis=0)  # (16, CHUNK)
        return acc + jax.lax.dot_general(
            oh_k, vals, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (C, 16), 1 pass

    acc = jax.lax.fori_loop(0, h_ref.shape[1], row,
                            jnp.zeros((c, 16), jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def cwide_tables(assign, tables, num_cells: int):
    """Per-image kernel operands from a ParentAssignment (single image;
    vmap at the caller): allowedT (C, C) f32 and the three lane-broadcast
    center tables (C, 128) f32 in valid order."""
    c = num_cells
    allowedT = assign.allowed.astype(jnp.float32).T       # [k, cell]
    centers_by_k = tables.centers[assign.order].astype(jnp.float32)
    bcast = lambda col: jnp.broadcast_to(col[:, None], (c, 128))
    return (allowedT, bcast(centers_by_k[:, 0]), bcast(centers_by_k[:, 1]),
            bcast(centers_by_k[:, 2]))


def palette_sums_by_k_cwide(h, s, v, allowedT, ch, cs, cv,
                            num_cells: int, cfg) -> jnp.ndarray:
    """(B, P) pixels -> (B, C, 4) palette sums in valid order, same output
    layout/recombination as pallas_kernels.palette_sums_by_k.  Cell ids
    are computed in-kernel; padded pixels carry the hue sentinel -1."""
    b = h.shape[0]
    c = num_cells
    shaped_h = _shape_pixels(h, -1.0)
    sv = functools.partial(_shape_pixels, fill=0.0)
    t = shaped_h.shape[1] // _ROWS

    pix = pl.BlockSpec((1, _ROWS, _CHUNK), lambda bb, i: (bb, i, 0),
                       memory_space=pltpu.VMEM)
    mat = pl.BlockSpec((1, c, c), lambda bb, i: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((1, c, 128), lambda bb, i: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_palette_kernel_cwide, num_cells=c, cfg=cfg),
        grid=(b, t),
        in_specs=[pix, pix, pix, mat, col, col, col],
        out_specs=pl.BlockSpec((1, c, 16), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 16), jnp.float32),
    )(shaped_h, sv(s), sv(v), allowedT, ch, cs, cv)
    return _recombine_split_sums(out)
