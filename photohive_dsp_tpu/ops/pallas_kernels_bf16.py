"""bf16-operand / full-sublane variants of the rgb-native palette kernels.

Same math, same results as ops/pallas_kernels.py's rgb kernels (reference
semantics cited there; src/color_quantization.c:108-576) — this module only
restructures the per-row work for VPU issue efficiency, the measured
bottleneck (SPEED.md: the kernels run well above both their MXU and VPU
instruction costs; most vector ops were (1, lanes)-shaped, using 1/8 of the
VPU's sublanes, and every one-hot/LUT/value operand was f32, doubling the
vector registers each select/concat touches).

Two changes, both value-preserving:

1. **bf16 operands for everything the MXU consumes.**  DEFAULT-precision
   f32 dot_general is already a single bf16 MXU pass — the inputs get
   rounded to bf16 inside the unit regardless.  Materializing the one-hots,
   the candidate LUT (bf16-exact split terms by construction), and the
   value rows (bf16-exact split terms) in bf16 is therefore bit-identical
   to what the hardware computed before, while halving the vregs written
   per select/concat (f32 tiles are (8, 128); bf16 tiles are (16, 128)).
   Comparisons stay int32/f32 — this target's VPU has no bf16 compare
   ("Target does not support this comparison"); only the select output and
   the dot operands are bf16.

2. **Full-sublane elementwise math.**  HSV conversion, cell assignment and
   the value splits are computed once per (_ROWS, W) block at 8-sublane
   utilization and statically sliced per row-chunk, instead of being
   recomputed on (1, lanes) rows at 1/8 utilization.  The loops over rows
   and lane chunks are Python-unrolled (static value slices; Mosaic
   handles dynamic sublane slicing of values poorly).

Parity: products against 0/1 one-hots of bf16-exact terms are exact, the
f32 accumulator is unchanged, and the distance/argmin/tie math stays in
f32 — op-for-op the same as pallas_kernels._palette_rgb_kernel, which the
tests pin (tests/test_pallas_interpret.py) and tools/tpu_parity_check.py
gates on silicon.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_kernels import (_BIG, _ROWS, _cell_ids_row, _hsv_rows,
                             _lane_chunk, _recombine_split_sums, _split3,
                             lut_sections)


def _hsv_cells_block(rgb_ref, cfg):
    """HSV + cell ids for the whole (_ROWS, W) block at full sublane
    utilization.  Op-for-op the same math as _hsv_rows/_cell_ids_row.

    Accepts uint8 blocks too (the u8-native path: the planarized f32 rgb
    never materializes in HBM, 4x less kernel input traffic).  The
    in-kernel conversion is colorspace.u8_to_unit_f32's division-free
    correctly-rounded sequence (Mosaic's hardware divide approximates
    differently from XLA's — see that docstring), so the planes are
    bit-identical to every other ingest flavor (hardware-gated by
    tools/tpu_parity_check.py)."""
    r = rgb_ref[0, 0]                                     # (_ROWS, W)
    g = rgb_ref[0, 1]
    b = rgb_ref[0, 2]
    if r.dtype == jnp.uint8:
        from .colorspace import INV255_F32

        def conv(x):
            # Mosaic has no direct u8->f32 cast; go through int32.  Same
            # bitcast-exponent *256 as u8_to_unit_f32 (a literal *256.0
            # would constant-fold with *INV255 under interpret mode's XLA
            # simplifier and re-round).
            xf = x.astype(jnp.int32).astype(jnp.float32)
            q0 = xf * INV255_F32
            s = jax.lax.bitcast_convert_type(
                jax.lax.bitcast_convert_type(q0, jnp.int32) + (8 << 23),
                jnp.float32)
            rr = (xf - s) + q0
            q = q0 + rr * INV255_F32
            return jnp.where(xf == 0.0, 0.0, q)

        r, g, b = conv(r), conv(g), conv(b)
    h, s, v = _hsv_rows(r, g, b)
    cells = _cell_ids_row(h, s, v, cfg)
    return h, s, v, cells


def _onehot_bf16(iota_i32, ids_row):
    """(C, wc) bf16 one-hot from an int32 iota and an int32 id row.  The
    compare runs in int32 (no bf16 compare on this target); only the 0/1
    select output is bf16 — half the vreg writes and the dtype the MXU
    ingests anyway."""
    return (iota_i32 == ids_row).astype(jnp.bfloat16)


# Max merged contraction width per sums GEMM (pixels).  The per-chunk
# (C, wc) x (wc, 16) sums contraction was the wide kernel's DOMINANT cost
# on silicon (+14.5 ms of an ~18 ms 33-MP kernel, tools/kernel_cost_probe)
# — N=16 leaves the MXU mostly idle and the per-call overhead is paid 24x
# per block.  Merging the block's one-hot/value chunks into one contraction
# measured -5.4 ms (tools/sums_gemm_experiment: chunk 43.6 / row 40.1 /
# block 38.2 ms; the transposed formulation was worse, 70 ms).  The cap
# bounds the merged one-hot's VMEM at (C, 15360) bf16 ~ 3.4 MB for C=112.
_SUMS_FLUSH_PX = 15360


def _sums_flush_px() -> int:
    """Trace-time flush threshold (pixels per merged sums GEMM).
    PHOTOHIVE_SUMS_FLUSH_PX overrides for A/B; 7680 (two flushes per
    1080p block) measured -2.9 ms/33 MP vs one merged flush in the
    round-5 on-chip session (tools/sums_gemm_experiment split2 —
    interleaving a GEMM mid-block lets it overlap the next chunks'
    VPU work)."""
    import os

    return int(os.environ.get("PHOTOHIVE_SUMS_FLUSH_PX",
                              str(_SUMS_FLUSH_PX)))


class _MergedSums:
    """Accumulates (one_hot, vals) chunk pairs and flushes them through one
    dot_general when ``flush_px`` pixels are queued.  Adds reassociate
    relative to per-chunk GEMMs (counts stay exact — 0/1 products in an
    f32 accumulator; hue/s/v sums move by f32 rounding order only, like
    any shard split)."""

    def __init__(self, acc, flush_px: int = None):
        self.acc = acc
        self.ohs = []
        self.vls = []
        self.lanes = 0
        self.flush_px = _SUMS_FLUSH_PX if flush_px is None else flush_px

    def add(self, oh, vals_bf16):
        self.ohs.append(oh)
        self.vls.append(vals_bf16)
        self.lanes += oh.shape[1]
        if self.lanes >= self.flush_px:
            self.flush()

    def flush(self):
        if not self.ohs:
            return
        oh_all = self.ohs[0] if len(self.ohs) == 1 \
            else jnp.concatenate(self.ohs, axis=1)
        vl_all = self.vls[0] if len(self.vls) == 1 \
            else jnp.concatenate(self.vls, axis=1)
        self.acc = self.acc + jax.lax.dot_general(
            oh_all, vl_all, (((1,), (1,)), ((), ())),
            preferred_element_type=self.acc.dtype)
        self.ohs, self.vls, self.lanes = [], [], 0


def _cell_counts_rgb_kernel_bf16(rgb_ref, out_ref, s_ref, *,
                                 num_cells: int, cfg, wc: int):
    """Histogram + saturation sum; see _cell_counts_rgb_kernel.

    Counts go through an int8 one-hot x int8 ones GEMM with an int32
    accumulator — exact for ANY count (no f32 2^24 bound) and the int8
    MXU runs at twice the bf16 rate (measured -2.3 ms at 33 MP).  The
    saturation sum (a GLOBAL mean's numerator — it never needed the
    one-hot) accumulates on the VPU into an (8, 128) lane-parallel
    accumulator instead of riding three bf16-split GEMM columns."""
    step = pl.program_id(1)
    c = num_cells
    w = rgb_ref.shape[3]
    rows = rgb_ref.shape[2]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)

    h8, s8, v8, c8 = _hsv_cells_block(rgb_ref, cfg)
    del h8, v8

    ohs = []
    for j in range(rows):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            ohs.append((iota_c == c8[j:j + 1, sl]).astype(jnp.int8))
    oh_all = jnp.concatenate(ohs, axis=1)                 # (C, rows*w)
    ones = jnp.ones((8, oh_all.shape[1]), jnp.int8)
    acc = jax.lax.dot_general(oh_all, ones, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)  # (C, 8)

    s_acc = jnp.zeros((8, 128), jnp.float32)
    for k0 in range(w // 128):
        s_acc = s_acc + s8[:, k0 * 128:(k0 + 1) * 128]

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc
        s_ref[0] = s_acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc
        s_ref[0] += s_acc


def cell_counts_s_from_rgb(rgb: jnp.ndarray, cfg):
    """bf16-variant twin of pallas_kernels.cell_counts_s_from_rgb.

    The saturation sum reassociates relative to the split-GEMM form
    (per-lane f32 accumulators, reduced outside) — same ~sqrt(n)*eps
    error class, tested against the XLA mean at 1e-6 relative."""
    b, _, hh, ww = rgb.shape
    c = cfg.num_cells
    wc = _lane_chunk(ww)
    assert ww % 128 == 0  # palette_rgb_eligible guarantees this
    out, s_out = pl.pallas_call(
        functools.partial(_cell_counts_rgb_kernel_bf16, num_cells=c,
                          cfg=cfg, wc=wc),
        grid=(b, hh // _ROWS),
        in_specs=[pl.BlockSpec((1, 3, _ROWS, ww),
                               lambda bb, i: (bb, 0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((1, c, 8), lambda bb, i: (bb, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((1, 8, 128), lambda bb, i: (bb, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((b, c, 8), jnp.int32),
                   jax.ShapeDtypeStruct((b, 8, 128), jnp.float32)),
    )(rgb)
    counts = out[..., 0]
    s_sum = jnp.sum(s_out, axis=(1, 2))
    return counts, s_sum


def _use_i8_sums() -> bool:
    """PHOTOHIVE_SUMS_I8=1 routes the wide kernel's palette sums through
    the int8 digit-plane GEMM (read at trace time; part of the batch
    cache key via _kernel_variant)."""
    import os

    return os.environ.get("PHOTOHIVE_SUMS_I8", "0") == "1"


def _digits4(x, scale: float):
    """4 base-128 int8 digit planes of floor(x * scale), low digit
    first.  floor(x*scale) is integral-exact for any f32 x with
    x*scale's exponent >= mantissa width (x >= range/2^4 at the scales
    used); smaller values truncate by < 1/scale absolute per pixel."""
    xq = jnp.floor(x * jnp.float32(scale))
    out = []
    for _ in range(4):
        hi = jnp.floor(xq * jnp.float32(1.0 / 128.0))
        out.append((xq - hi * 128.0).astype(jnp.int8))
        xq = hi
    return out


# Fixed-point scales: hue (range 360) * 2^19 < 2^28 = 4 digits; s/v
# (range 1) * 2^27 < 2^28.  Values >= range/2^4 convert exactly; the
# sub-2^-4 tail truncates by <= 1/scale abs per pixel (mean error
# <= 2^-19/count — far below the palette's 1e-4 comparison bars).
_HUE_SCALE = 2.0 ** 19
_SV_SCALE = 2.0 ** 27


def _recombine_digit_sums(out: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) int32 digit-sum kernel output -> (..., 4) f32 palette
    sums [hue, s, v, count] (the _recombine_split_sums contract).

    Column layout: [count | hue d0..d3 | s d0..d3 | v d0..d3 | pad x3].
    The digit sums are int32-EXACT (the bf16 path rounds every f32
    accumulate); only this Horner recombination rounds, at ~2^-24
    relative of the final sum."""
    o = out.astype(jnp.float32)

    def horner(c0):
        return ((o[..., c0 + 3] * 128.0 + o[..., c0 + 2]) * 128.0
                + o[..., c0 + 1]) * 128.0 + o[..., c0]

    return jnp.stack(
        [horner(1) * jnp.float32(1.0 / _HUE_SCALE),
         horner(5) * jnp.float32(1.0 / _SV_SCALE),
         horner(9) * jnp.float32(1.0 / _SV_SCALE),
         o[..., 0]], axis=-1)


def _decode_lut_f32(lu: jnp.ndarray, q: int, num_cells: int):
    """Recombine gathered LUT sections (f32 GEMM output) -> candk, ch, cs,
    cv, each (q, chunk) f32.  Layout must match palette_candidate_lut."""
    o = 1 if lut_sections(num_cells) == 10 else 3
    candk = lu[0:q] if o == 1 else lu[0:q] + lu[q:2 * q] + lu[2 * q:3 * q]
    ch = lu[o * q:(o + 1) * q] + lu[(o + 1) * q:(o + 2) * q] \
        + lu[(o + 2) * q:(o + 3) * q]
    cs = lu[(o + 3) * q:(o + 4) * q] + lu[(o + 4) * q:(o + 5) * q] \
        + lu[(o + 5) * q:(o + 6) * q]
    cv = lu[(o + 6) * q:(o + 7) * q] + lu[(o + 7) * q:(o + 8) * q] \
        + lu[(o + 8) * q:(o + 9) * q]
    return candk, ch, cs, cv


def _palette_rgb_kernel_bf16(rgb_ref, lut_ref, out_ref, *, num_cells: int,
                             q_pad: int, cfg, wc: int,
                             sums_i8: bool = False,
                             flush_px: int = None):
    """Per-pixel parent resolution + palette sums; see _palette_rgb_kernel.
    Distance/argmin/tie math is f32 and op-identical to the XLA pixel pass
    (quantize.palette_pixel_sums), so ties break bit-identically.

    ``sums_i8``: the sums contraction runs as int8 digit planes x int8
    one-hot with an int32 accumulator (counts exact, digit sums exact;
    see _recombine_digit_sums) — the int8 MXU streams K ~1.7x faster
    than bf16 (tools/nfill_probe) and the sums GEMM is the wide
    kernel's dominant marginal cost (tools/kernel_cost_probe r5:
    +10.4 ms of a ~13 ms 33-MP kernel)."""
    step = pl.program_id(1)
    c = num_cells
    q = q_pad
    w = rgb_ref.shape[3]
    rows = rgb_ref.shape[2]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    iota_cf = iota_c.astype(jnp.float32)
    ones = jnp.ones((1, wc), jnp.float32)
    lut = lut_ref[0]                                      # (ns*q, C) bf16

    h8, s8, v8, c8 = _hsv_cells_block(rgb_ref, cfg)
    if sums_i8:
        sd4 = [d for d in _digits4(s8, _SV_SCALE)]
        vd4 = [d for d in _digits4(v8, _SV_SCALE)]
    else:
        sp = _split3(s8)
        vp = _split3(v8)

    ms = _MergedSums(jnp.zeros((c, 16),
                               jnp.int32 if sums_i8 else jnp.float32),
                     flush_px=flush_px)
    for j in range(rows):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            hrow = h8[j:j + 1, sl]                        # (1, wc) f32
            srow = s8[j:j + 1, sl]
            vrow = v8[j:j + 1, sl]
            oh_c = _onehot_bf16(iota_c, c8[j:j + 1, sl])
            lu = jax.lax.dot_general(
                lut, oh_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (ns*q, wc) f32
            candk, ch, cs, cv = _decode_lut_f32(lu, q, c)
            hd = jnp.abs(hrow - ch)                       # (q, wc) f32
            hd = jnp.where(hd > 180.0, 360.0 - hd, hd) \
                * jnp.float32(1 / 360.0)
            sd = srow - cs
            vd = vrow - cv
            d = hd * hd + sd * sd + vd * vd
            dm = jnp.where(candk < jnp.float32(c), d, jnp.float32(_BIG))
            minv = jnp.min(dm, axis=0, keepdims=True)
            iskmin = dm == minv
            kstar = jnp.min(jnp.where(iskmin, candk, jnp.float32(c)),
                            axis=0, keepdims=True)
            chosen = jnp.logical_and(iskmin, candk == kstar)
            off = jnp.sum(jnp.where(chosen, jnp.float32(180.0) - ch, 0.0),
                          axis=0, keepdims=True)
            temp = hrow + off
            temp = jnp.where(temp > 360.0, temp - 360.0,
                             jnp.where(temp < 0.0, temp + 360.0, temp))
            if sums_i8:
                oh_k = (iota_cf == kstar).astype(jnp.int8)
                hd4 = _digits4(temp, _HUE_SCALE)
                vals = jnp.concatenate(
                    [jnp.ones((1, wc), jnp.int8)] + hd4
                    + [dd[j:j + 1, sl] for dd in sd4]
                    + [dd[j:j + 1, sl] for dd in vd4]
                    + [jnp.zeros((3, wc), jnp.int8)], axis=0)  # (16, wc)
                ms.add(oh_k, vals)
            else:
                oh_k = (iota_cf == kstar).astype(jnp.bfloat16)
                t1, t2, t3 = _split3(temp)
                vals = jnp.concatenate(
                    [ones, t1, t2, t3,
                     sp[0][j:j + 1, sl], sp[1][j:j + 1, sl],
                     sp[2][j:j + 1, sl],
                     vp[0][j:j + 1, sl], vp[1][j:j + 1, sl],
                     vp[2][j:j + 1, sl],
                     jnp.zeros((6, wc), jnp.float32)], axis=0)  # (16, wc)
                ms.add(oh_k, vals.astype(jnp.bfloat16))
    ms.flush()
    acc = ms.acc

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def palette_sums_by_k_rgb(rgb: jnp.ndarray, luts: jnp.ndarray,
                          num_cells: int, q_pad: int, cfg) -> jnp.ndarray:
    """bf16-variant twin of pallas_kernels.palette_sums_by_k_rgb.  ``luts``
    is the f32 output of palette_candidate_lut — every section term is
    bf16-exact by construction, so the cast below is lossless."""
    b, _, hh, ww = rgb.shape
    c = num_cells
    wc = _lane_chunk(ww, 1024 if q_pad > 8 else 2048)
    # int32 digit-sum headroom: a digit column accumulates up to
    # 127 * pixels per cell; above ~2^31/127 ~= 16.9 M pixels a
    # single-cell image would wrap the accumulator, so the i8 variant
    # only engages below that bound (8K frames stay on bf16).
    sums_i8 = _use_i8_sums() and hh * ww <= (1 << 31) // 127
    out = pl.pallas_call(
        functools.partial(_palette_rgb_kernel_bf16, num_cells=c,
                          q_pad=q_pad, cfg=cfg, wc=wc, sums_i8=sums_i8,
                          flush_px=_sums_flush_px()),
        grid=(b, hh // _ROWS),
        in_specs=[
            pl.BlockSpec((1, 3, _ROWS, ww), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lut_sections(c) * q_pad, c),
                         lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 16), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(
            (b, c, 16), jnp.int32 if sums_i8 else jnp.float32),
    )(rgb, luts.astype(jnp.bfloat16))
    return (_recombine_digit_sums(out) if sums_i8
            else _recombine_split_sums(out))


def _palette_rgb_q1_kernel_bf16(rgb_ref, lut_ref, out_ref, *,
                                num_cells: int, cfg, wc: int):
    """q=1 tier (no populated cell tied); see _palette_rgb_q1_kernel."""
    step = pl.program_id(1)
    c = num_cells
    w = rgb_ref.shape[3]
    rows = rgb_ref.shape[2]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    ones = jnp.ones((1, wc), jnp.float32)
    lut = lut_ref[0]                                      # (3, C) bf16

    h8, s8, v8, c8 = _hsv_cells_block(rgb_ref, cfg)
    sp = _split3(s8)
    vp = _split3(v8)

    ms = _MergedSums(jnp.zeros((c, 16), jnp.float32),
                     flush_px=_sums_flush_px())
    for j in range(rows):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            oh_c = _onehot_bf16(iota_c, c8[j:j + 1, sl])
            lu = jax.lax.dot_general(
                lut, oh_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (3, wc) f32
            off = lu[0:1] + lu[1:2] + lu[2:3]             # exact
            temp = h8[j:j + 1, sl] + off
            temp = jnp.where(temp > 360.0, temp - 360.0,
                             jnp.where(temp < 0.0, temp + 360.0, temp))
            t1, t2, t3 = _split3(temp)
            vals = jnp.concatenate(
                [ones, t1, t2, t3,
                 sp[0][j:j + 1, sl], sp[1][j:j + 1, sl], sp[2][j:j + 1, sl],
                 vp[0][j:j + 1, sl], vp[1][j:j + 1, sl], vp[2][j:j + 1, sl],
                 jnp.zeros((6, wc), jnp.float32)], axis=0)  # (16, wc)
            ms.add(oh_c, vals.astype(jnp.bfloat16))       # (C, 16) by cell
    ms.flush()
    acc = ms.acc

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def palette_sums_by_k_rgb_q1(rgb: jnp.ndarray, assign, tables,
                             num_cells: int, cfg) -> jnp.ndarray:
    """bf16-variant twin of pallas_kernels.palette_sums_by_k_rgb_q1."""
    from .pallas_kernels import palette_offset_lut, parent_slot_matrix

    b, _, hh, ww = rgb.shape
    c = num_cells
    wc = _lane_chunk(ww)
    luts = jax.vmap(
        lambda a: palette_offset_lut(a, tables, c))(assign)  # (B, 3, C)
    out = pl.pallas_call(
        functools.partial(_palette_rgb_q1_kernel_bf16, num_cells=c,
                          cfg=cfg, wc=wc),
        grid=(b, hh // _ROWS),
        in_specs=[
            pl.BlockSpec((1, 3, _ROWS, ww), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 16), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 16), jnp.float32),
    )(rgb, luts.astype(jnp.bfloat16))
    by_cell = _recombine_split_sums(out)                  # (B, C, 4)
    perm = jax.vmap(lambda a: parent_slot_matrix(a, c))(assign)
    return jnp.einsum("bkc,bcq->bkq", perm, by_cell,
                      precision=jax.lax.Precision.HIGHEST)
