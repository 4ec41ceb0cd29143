"""Pallas TPU kernels for the scatter-shaped hot ops.

These ops are "histogram-shaped" — per-pixel small-table lookups and
segment sums whose XLA lowerings either scatter (serialized on TPU), gather
(bandwidth-crippled), or burn O(table) VPU work per pixel:

  * ``polar_bin_sums`` — the blur-profile binning (reference scatter loop
    src/blur_profile.c:87-100).  The (angle,radius) bin id per FFT pixel is
    a shape-static table, shared by every image in the batch, so the bin
    reduction is a GEMM: per 512-pixel chunk, build the (num_bins, 512)
    one-hot in VMEM and contract it with the (512, B) value slab of *all*
    images at once on the MXU.

  * ``cell_counts_kernel`` / ``palette_sums_kernel`` — the color
    quantizer's histogram and per-pixel parent-resolution passes (reference
    arm_octree / group_irregular_pixels / calculate_avg_hsv,
    src/color_quantization.c:108-576).  The design rule: per pixel, only
    ~2-3 cell-width (C, chunk) VPU ops (the one-hot compares), with every
    per-pixel table lookup done as a (1, C) x (C, chunk) MXU matvec against
    the one-hot, and the per-bin sums as a (C, chunk) x (chunk, 4) MXU
    contraction.  The tie-break branch (distance argmin over tied parents)
    is gated per 1024-pixel row with lax.cond on "any tied pixel here", so
    its ~20 C-wide ops run only on the rare rows that need them.

  * ``margin_sort`` — the reference's insertion sort with the truncating
    float32 margin comparator (src/utilities.c:132-153,
    src/color_quantization.c:601-611).  Sequential by nature; all batch
    rows sort simultaneously in one VMEM-resident kernel.

Each kernel has an XLA reference implementation in ops/blur.py /
ops/quantize.py used on CPU and in parity tests.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024
_BIG = 3.0e38  # python float: jnp scalars captured in kernels are rejected


def _pad_to(x: jnp.ndarray, mult: int, axis: int, value) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


# ---------------------------------------------------------------------------
# polar bin sums
# ---------------------------------------------------------------------------

_POLAR_CHUNK = 512


def _polar_kernel(ids_ref, v_ref, out_ref, *, num_bins: int):
    step = pl.program_id(0)
    ids = ids_ref[0]                                     # (1, CHUNK) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (num_bins, _POLAR_CHUNK), 0)
    onehot = (iota == ids).astype(jnp.float32)           # (NB, CHUNK)
    # Mosaic's default f32 matmul is a single bf16 pass, which rounds the
    # values (and was observed mis-summing large-M one-hot contractions);
    # HIGHEST gives exact f32 products for the 0/1 weights (Mosaic does not
    # implement Precision.HIGH).
    part = jax.lax.dot_general(onehot, v_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)

    @pl.when(step == 0)
    def _():
        out_ref[...] = part

    @pl.when(step > 0)
    def _():
        out_ref[...] += part


def polar_bin_sums(vals: jnp.ndarray, bin_ids: jnp.ndarray,
                   num_bins: int) -> jnp.ndarray:
    """Sum vals into bins: (B, P) f32 x (P,) int32 -> (B, num_bins) f32.

    The bin-id table is shared across the batch (shape-static), so each
    VMEM one-hot chunk amortizes over all B images: per 512-pixel chunk the
    (num_bins, 512) one-hot is built in VMEM and contracted with the
    (512, B) value slab on the MXU — no scatter, no HBM one-hot.
    """
    b, p = vals.shape
    nb = -(-num_bins // 8) * 8
    ids = _pad_to(bin_ids.astype(jnp.int32), _POLAR_CHUNK, 0, nb)
    vals_t = _pad_to(vals.T, _POLAR_CHUNK, 0, 0.0)       # (Ppad, B)
    n_chunks = ids.shape[0] // _POLAR_CHUNK

    out = pl.pallas_call(
        functools.partial(_polar_kernel, num_bins=nb),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, _POLAR_CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_POLAR_CHUNK, b), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, b), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, b), jnp.float32),
    )(ids.reshape(n_chunks, 1, _POLAR_CHUNK), vals_t)
    return out[:num_bins].T                              # (B, num_bins)


# ---------------------------------------------------------------------------
# color-quantizer kernels
# ---------------------------------------------------------------------------

_ROWS = 8  # pixel rows (of _CHUNK lanes) per grid step


def _shape_pixels(x: jnp.ndarray, fill) -> jnp.ndarray:
    """(B, P) -> (B, T*_ROWS, _CHUNK), padded with ``fill``."""
    b = x.shape[0]
    x = _pad_to(x, _ROWS * _CHUNK, 1, fill)
    return x.reshape(b, -1, _CHUNK)


def _cell_counts_kernel(cell_ref, out_ref, *, num_cells: int):
    # NOTE: a lane-reduction to a (C, 1) accumulator hangs the Mosaic
    # compiler here; contracting against a (4, CH) ones matrix on the MXU
    # compiles instantly and gives the same counts (column 0).
    step = pl.program_id(1)
    c = num_cells
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, _CHUNK), 0)
    ones = jnp.ones((4, _CHUNK), jnp.float32)

    def row(j, acc):
        crow = cell_ref[0, pl.ds(j, 1), :]
        oh_c = (iota_c == crow).astype(jnp.float32)
        return acc + jax.lax.dot_general(
            oh_c, ones, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    acc = jax.lax.fori_loop(0, cell_ref.shape[1], row,
                            jnp.zeros((c, 4), jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def cell_counts_batched(cells: jnp.ndarray, num_cells: int) -> jnp.ndarray:
    """Histogram of cell ids: (B, P) int32 -> (B, C) int32 (Pallas)."""
    b = cells.shape[0]
    shaped = _shape_pixels(cells.astype(jnp.int32), num_cells)
    t = shaped.shape[1] // _ROWS
    out = pl.pallas_call(
        functools.partial(_cell_counts_kernel, num_cells=num_cells),
        grid=(b, t),
        in_specs=[pl.BlockSpec((1, _ROWS, _CHUNK), lambda bb, i: (bb, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, num_cells, 4), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, num_cells, 4), jnp.float32),
    )(shaped)
    return jnp.round(out[..., 0]).astype(jnp.int32)


class PaletteKernelTables(NamedTuple):
    """Per-image (data-dependent) lookup rows feeding the palette kernel.

    Rows are laid out (1, C) so in-kernel lookups are (1, C) x (C, CH)
    MXU matvecs against the cell one-hot; ``allowed_t`` is the 0/1
    tie-candidate matrix contracted against the one-hot at default (bf16)
    precision — exact, since every operand is 0 or 1 and each output column
    has exactly one contributing term."""

    kof: jnp.ndarray       # (1, C) f32: unique parent slot per cell
    tied: jnp.ndarray      # (1, C) f32: 1.0 where per-pixel tie-break runs
    offs: jnp.ndarray      # (1, C) f32: hue offset per valid-order slot
    ck_h: jnp.ndarray      # (1, C) f32 parent-center hue, valid order
    ck_s: jnp.ndarray      # (1, C)
    ck_v: jnp.ndarray      # (1, C)
    allowed_t: jnp.ndarray  # (C, C) f32 0/1: [k, cell] tie candidate


def palette_kernel_tables(assign, tables, num_cells: int)\
        -> PaletteKernelTables:
    """Build the kernel lookup rows from a quantize.ParentAssignment."""
    c = num_cells
    order = assign.order
    centers_by_k = tables.centers[order].astype(jnp.float32)
    offsets = (180.0 - tables.centers[:, 0]).astype(jnp.float32)
    pos_in_order = jnp.zeros((c,), jnp.int32).at[order].set(
        jnp.arange(c, dtype=jnp.int32))
    k_of_cell = pos_in_order[assign.parent_of_cell]
    row = lambda x: x.astype(jnp.float32)[None, :]
    return PaletteKernelTables(
        kof=row(k_of_cell), tied=row(assign.cell_tied),
        offs=row(offsets[order]), ck_h=row(centers_by_k[:, 0]),
        ck_s=row(centers_by_k[:, 1]), ck_v=row(centers_by_k[:, 2]),
        allowed_t=assign.allowed.T.astype(jnp.float32),
    )


def _palette_kernel(h_ref, s_ref, v_ref, cell_ref, kof_ref, tied_ref,
                    offs_ref, ckh_ref, cks_ref, ckv_ref, allow_ref,
                    out_ref, *, num_cells: int):
    """Per-pixel parent resolution + palette sums, tie-exact and branchless:
    the tie-break argmin runs unconditionally but costs only ~10 cell-width
    VPU ops per 1024-pixel row (the candidate mask comes from one bf16 0/1
    matmul against the cell one-hot)."""
    step = pl.program_id(1)
    c = num_cells
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, _CHUNK), 0)
    exact = jax.lax.Precision.HIGHEST
    cheap = jax.lax.Precision.DEFAULT

    def matvec(row_tab, oh, precision):
        # (1, C) @ (C, CH) -> (1, CH)
        return jax.lax.dot_general(
            row_tab, oh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=precision)

    def row(j, acc):
        hrow = h_ref[0, pl.ds(j, 1), :]                   # (1, CHUNK)
        srow = s_ref[0, pl.ds(j, 1), :]
        vrow = v_ref[0, pl.ds(j, 1), :]
        crow = cell_ref[0, pl.ds(j, 1), :]
        in_img = (crow < c).astype(jnp.float32)           # (1, CHUNK)
        oh_c = (iota_c == crow).astype(jnp.float32)       # (C, CHUNK)
        # 0/1- and small-integer-valued lookups: exact at bf16 precision
        kof_p = matvec(kof_ref[0], oh_c, cheap)
        tied_p = matvec(tied_ref[0], oh_c, cheap)
        allowed = jax.lax.dot_general(
            allow_ref[0], oh_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=cheap)  # (Ck, CH)
        # per-pixel distance to each tie candidate (valid order)
        hd = jnp.abs(hrow - ckh_ref[0].reshape(c, 1))
        hd = jnp.where(hd > 180.0, 360.0 - hd, hd) * jnp.float32(1 / 360.0)
        sd = srow - cks_ref[0].reshape(c, 1)
        vd = vrow - ckv_ref[0].reshape(c, 1)
        d = hd * hd + sd * sd + vd * vd
        dm = jnp.where(allowed > 0.5, d, jnp.float32(_BIG))
        minv = jnp.min(dm, axis=0, keepdims=True)
        kstar = jnp.min(jnp.where(dm == minv, iota_c, c), axis=0,
                        keepdims=True).astype(jnp.float32)
        kfin = jnp.where(tied_p > 0.5, kstar, kof_p)
        kfin = jnp.where(in_img > 0.5, kfin, jnp.float32(c))
        oh_k = (iota_c == kfin.astype(jnp.int32)).astype(jnp.float32)
        off = matvec(offs_ref[0], oh_k, exact)
        temp = hrow + off
        temp = jnp.where(temp > 360.0, temp - 360.0,
                         jnp.where(temp < 0.0, temp + 360.0, temp))
        vals = jnp.concatenate(
            [temp * in_img, srow * in_img, vrow * in_img, in_img], axis=0)
        return acc + jax.lax.dot_general(
            oh_k, vals, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=exact)  # (C, 4)

    acc = jax.lax.fori_loop(0, h_ref.shape[1], row,
                            jnp.zeros((c, 4), jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def palette_sums_by_k(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray,
                      cells: jnp.ndarray, ktabs: PaletteKernelTables,
                      num_cells: int) -> jnp.ndarray:
    """Palette sums per valid-order slot: (B, P) pixels -> (B, C, 4) f32 of
    [sum wrapped-hue, sum s, sum v, count] — the valid_parents layout that
    quantize.palette_finalize_by_k consumes."""
    b = h.shape[0]
    c = num_cells
    sh = functools.partial(_shape_pixels, fill=0.0)
    shaped_cells = _shape_pixels(cells.astype(jnp.int32), c)
    t = shaped_cells.shape[1] // _ROWS

    pix = pl.BlockSpec((1, _ROWS, _CHUNK), lambda bb, i: (bb, i, 0),
                       memory_space=pltpu.VMEM)
    tab = pl.BlockSpec((1, 1, c), lambda bb, i: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    allow = pl.BlockSpec((1, c, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_palette_kernel, num_cells=c),
        grid=(b, t),
        in_specs=[pix, pix, pix, pix, tab, tab, tab, tab, tab, tab, allow],
        out_specs=pl.BlockSpec((1, c, 4), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 4), jnp.float32),
    )(sh(h), sh(s), sh(v), shaped_cells, ktabs.kof, ktabs.tied, ktabs.offs,
      ktabs.ck_h, ktabs.ck_s, ktabs.ck_v, ktabs.allowed_t)
    return out


# ---------------------------------------------------------------------------
# margin insertion sort
# ---------------------------------------------------------------------------

def _sort_kernel(sal_ref, out_ref, *, c: int):
    """All batch rows sort simultaneously: every step's vector ops span the
    whole (B, lanes) block, so the 16-row batch costs the same instruction
    stream as one row.  The c-1 insertion steps are unrolled straight-line
    (no per-iteration loop overhead)."""
    b, lanes = sal_ref.shape
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, lanes), 1)
    so = sal_ref[...]                                     # (B, lanes) f32
    order = iota
    neg = jnp.float32(-3.0e38)

    for i in range(1, c):
        sal_i = jnp.max(jnp.where(iota == i, so, neg), axis=1,
                        keepdims=True)                    # (B, 1)
        elem = jnp.max(jnp.where(iota == i, order, -1), axis=1,
                       keepdims=True)
        margin = (so - sal_i) <= jnp.float32(-1.0)
        blockers = jnp.logical_and(jnp.logical_not(margin), iota < i)
        last = jnp.max(jnp.where(blockers, iota, -1), axis=1, keepdims=True)
        pos = last + 1
        so_sh = pltpu.roll(so, 1, 1)
        or_sh = pltpu.roll(order, 1, 1)
        inner = iota <= i
        new_so = jnp.where(iota < pos, so,
                           jnp.where(iota == pos,
                                     jnp.broadcast_to(sal_i, so.shape),
                                     jnp.where(inner, so_sh, so)))
        new_or = jnp.where(iota < pos, order,
                           jnp.where(iota == pos,
                                     jnp.broadcast_to(elem, order.shape),
                                     jnp.where(inner, or_sh, order)))
        so, order = new_so, new_or
    out_ref[...] = order


def margin_sort(sal: jnp.ndarray) -> jnp.ndarray:
    """Batch margin-comparator insertion argsort: (B, C) f32 -> (B, C) int32.

    Exact replica of custom_sort + compare_quantities (see quantize.
    margin_insertion_argsort for the derivation); pads sort to the tail and
    never interact with real elements.
    """
    b, c = sal.shape
    lanes = max(128, -(-c // 128) * 128)
    sal_p = _pad_to(sal, lanes, 1, -3.0e38)
    out = pl.pallas_call(
        functools.partial(_sort_kernel, c=c),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lanes), jnp.int32),
    )(sal_p)
    return out[:, :c]
