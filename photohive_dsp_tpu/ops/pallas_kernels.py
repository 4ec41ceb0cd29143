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
    the two unavoidable cell-width (C, chunk) one-hot compares; every
    per-pixel table lookup is a single exact one-hot GEMM against a
    (12*q_pad, C) candidate LUT, and the tie-break distance/argmin math runs
    on (q_pad, chunk) arrays, where q_pad (~40) is the static bound on
    tie-candidate count from the exact distance-rank geometry — ~3x less
    VPU work than a full C-wide (112) formulation.  The per-bin sums are a
    (C, chunk) x (chunk, 4) MXU contraction.

  * ``margin_sort`` — the reference's insertion sort with the truncating
    float32 margin comparator (src/utilities.c:132-153,
    src/color_quantization.c:601-611).  Sequential by nature; all batch
    rows sort simultaneously in one VMEM-resident kernel.

Each kernel has an XLA reference implementation in ops/blur.py /
ops/quantize.py used on CPU and in parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 1024
_BIG = 3.0e38  # python float: jnp scalars captured in kernels are rejected


def _split3(x):
    """In-kernel 3-term bf16 rounding split: x ~= a+b+c with each term
    bf16-exact, so a DEFAULT-precision (single bf16 pass) one-hot GEMM
    sums them ~2^-24-accurately.  Shared by the palette kernels (the
    bit-exact variant for LUT values is _trunc_split3 below)."""
    hi = x.astype(jnp.bfloat16).astype(jnp.float32)
    r = x - hi
    mid = r.astype(jnp.bfloat16).astype(jnp.float32)
    return hi, mid, r - mid


def _recombine_split_sums(out: jnp.ndarray) -> jnp.ndarray:
    """(..., 16) split-column kernel output -> (..., 4) palette sums
    [sum wrapped-hue, sum s, sum v, count].  Column layout (shared by
    both palette kernels): [count | hue x3 | sat x3 | val x3 | pad x6]."""
    return jnp.stack(
        [out[..., 1] + out[..., 2] + out[..., 3],
         out[..., 4] + out[..., 5] + out[..., 6],
         out[..., 7] + out[..., 8] + out[..., 9],
         out[..., 0]], axis=-1)


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
_POLAR_GROUP = 8  # chunks per local-kernel grid step (output sublane mult)


def _polar_kernel(ids_ref, v_ref, out_ref, *, num_bins: int):
    step = pl.program_id(0)
    ids = ids_ref[0]                                     # (1, CHUNK) int32
    iota = jax.lax.broadcasted_iota(jnp.int32, (num_bins, _POLAR_CHUNK), 0)
    # One-hot materialized in bf16 (the dtype the MXU ingests anyway):
    # the compare stays int32 (this target has no bf16 compare); only the
    # 0/1 select output is bf16, halving the vregs written for the
    # (NB, CHUNK) one-hot — the polar kernel's dominant VPU cost.
    onehot = (iota == ids).astype(jnp.bfloat16)          # (NB, CHUNK)
    # Mosaic's default f32 matmul is a single bf16 pass, which rounds the
    # values (and was observed mis-summing large-M one-hot contractions).
    # Instead of the exact-but-6-pass HIGHEST, split the values into three
    # bf16-exact terms: every product against the 0/1 one-hot is then exact
    # in ONE pass (the f32 accumulator sums ~2^-24-exact contributions).
    # Each term is materialized in bf16 directly — hi and mid are bf16
    # roundtrips by construction, and the residual gets the exact same
    # single rounding the bf16 MXU pass applied to it before.
    v = v_ref[...]                                       # (B, CHUNK)
    hi = v.astype(jnp.bfloat16)
    r = v - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    v3 = jnp.concatenate([hi, mid, lo], axis=0)          # (3B, CHUNK) bf16
    # Contract on the lane (pixel) dim for BOTH operands: the values stay
    # in their natural (B, P) layout, so the wrapper never transposes the
    # whole spectrum in HBM.
    part = jax.lax.dot_general(onehot, v3, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

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
    (B, 512) value slab on the MXU — no scatter, no HBM one-hot, no
    spectrum transpose (the contraction runs on the lane dim of both
    operands).
    """
    b, p = vals.shape
    nb = -(-num_bins // 8) * 8
    ids = _pad_to(bin_ids.astype(jnp.int32), _POLAR_CHUNK, 0, nb)
    vals_p = _pad_to(vals, _POLAR_CHUNK, 1, 0.0)         # (B, Ppad)
    n_chunks = ids.shape[0] // _POLAR_CHUNK

    out = pl.pallas_call(
        functools.partial(_polar_kernel, num_bins=nb),
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((1, 1, _POLAR_CHUNK), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, _POLAR_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((nb, 3 * b), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, 3 * b), jnp.float32),
    )(ids.reshape(n_chunks, 1, _POLAR_CHUNK), vals_p)
    # Recombine the hi/mid/lo split columns: section s of the 3B output
    # columns holds term s of image b at column s * b + b_idx.
    out = out[:num_bins, :b] + out[:num_bins, b:2 * b] + out[:num_bins, 2 * b:]
    return out.T                                         # (B, num_bins)


def _polar_local_kernel(lids_ref, v_ref, out_ref, *, k_local: int,
                        log_gate: bool = False):
    """Per-chunk bin sums against the chunk's LOCAL bin dictionary.

    The global one-hot contraction pays (A*R, CHUNK) compares and
    A*R x 3B x CHUNK MACs per chunk; a 512-px chunk only touches <= ~64
    distinct bins (geometry.polar_chunk_tables), so the local one-hot is
    ~45x smaller.  Both GEMM operands are in the MXU's natural layout —
    v3 (3B, CHUNK) contracts its lanes, the one-hot (CHUNK, K) its
    sublanes (local ids arrive pre-transposed from the host) — so no
    in-kernel relayout exists (a lane-lane contraction makes Mosaic
    transpose an operand; see the sums-GEMM experiment in SPEED.md)."""
    iota = jax.lax.broadcasted_iota(
        jnp.int32, (_POLAR_CHUNK, k_local), 1)
    v = v_ref[...]                                       # (B, G*CHUNK)
    if log_gate:
        # fused log-normalize, gain-deferred: the reference's
        # x<1 -> 0 else log(x)*G_s (src/fft_processing.c:192-199) with
        # the per-image G_s applied OUTSIDE the kernel — the gain is a
        # per-image scalar, so sum(log(x))*G_s == sum(log(x)*G_s) up to
        # f32 reassociation (the bins are SNR-gated, not bit-pinned).
        v = jnp.where(v < 1.0, 0.0, jnp.log(jnp.where(v < 1.0, 1.0, v)))
    hi = v.astype(jnp.bfloat16)
    r = v - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    v3 = jnp.concatenate([hi, mid, lo], axis=0)          # (3B, G*CHUNK)
    parts = []
    for g in range(_POLAR_GROUP):
        lids = lids_ref[0, g * _POLAR_CHUNK:(g + 1) * _POLAR_CHUNK]
        onehot = (iota == lids).astype(jnp.bfloat16)     # (CHUNK, K)
        parts.append(jax.lax.dot_general(
            v3[:, g * _POLAR_CHUNK:(g + 1) * _POLAR_CHUNK], onehot,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))         # (3B, K)
    out_ref[...] = jnp.stack(parts, axis=1)              # (3B, G, K)


def polar_bin_sums_local(vals: jnp.ndarray, local_ids: jnp.ndarray,
                         dict_ids: jnp.ndarray, num_bins: int,
                         log_gate: bool = False) -> jnp.ndarray:
    """Bin sums via per-chunk local dictionaries: (B, P) f32 ->
    (B, num_bins) f32.  ``local_ids``/``dict_ids`` come from
    geometry.polar_chunk_tables.

    The per-chunk (3B, K) partials land in a (3B, n_chunks, K) layout
    (minor dims contiguous — no transpose anywhere), then the GLOBAL
    combine reuses ``polar_bin_sums`` recursively: the partial table is
    ~128x smaller than the pixel stream, so the full-width one-hot
    contraction that was the bottleneck at pixel scale is trivial here,
    and its sentinel handling drops the dictionaries' padding slots for
    free.  (An XLA scatter-add combine measured +9 ms at batch 16 —
    worse than the 7 ms the local kernel saves; this combine is ~1 ms.)
    Bin sums reassociate relative to the global-accumulator kernel
    (exact split-term products either way, same SNR class)."""
    b, p = vals.shape
    n_chunks, k_local = dict_ids.shape                   # n_chunks % 8 == 0
    g = _POLAR_GROUP
    vals_p = _pad_to(vals, g * _POLAR_CHUNK, 1, 0.0)
    lids = local_ids.reshape(n_chunks // g, g * _POLAR_CHUNK, 1)
    parts = pl.pallas_call(
        functools.partial(_polar_local_kernel, k_local=k_local,
                          log_gate=log_gate),
        grid=(n_chunks // g,),
        in_specs=[
            pl.BlockSpec((1, g * _POLAR_CHUNK, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, g * _POLAR_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3 * b, g, k_local), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((3 * b, n_chunks, k_local),
                                       jnp.float32),
    )(lids, vals_p)
    flat3 = parts.reshape(3 * b, n_chunks * k_local)
    r = polar_bin_sums(flat3, dict_ids.reshape(-1), num_bins)  # (3B, NB)
    return r[:b] + r[b:2 * b] + r[2 * b:]                # (B, num_bins)


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
        # 0/1 x 1.0 products are exact even in the single bf16 pass of
        # DEFAULT precision; the f32 accumulator keeps counts exact.
        return acc + jax.lax.dot_general(
            oh_c, ones, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, cell_ref.shape[1], row,
                            jnp.zeros((c, 4), jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def cell_counts_batched(cells: jnp.ndarray, num_cells: int) -> jnp.ndarray:
    """Histogram of cell ids: (B, P) int32 -> (B, C) int32 (Pallas).

    Counts accumulate in float32 on the MXU, exact only up to 2^24 per
    cell; beyond that (a >16.7 MP near-flat image reaching the quantizer
    undecimated) this falls back to the exact int32 XLA compare-reduce.
    """
    if cells.shape[1] > (1 << 24):
        from .quantize import cell_counts
        return jax.vmap(lambda x: cell_counts(x, num_cells))(cells)
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


def _cell_counts_hsv_kernel(h_ref, s_ref, v_ref, out_ref, *,
                            num_cells: int, cfg):
    """Histogram with in-kernel cell assignment (_cell_ids_row): the same
    Mosaic lowering of the divide/clip cell math that the palette kernel
    uses, so a cell-boundary pixel can never land in different cells for
    counts vs sums (the XLA assign_cells lowering is out of the loop
    entirely on the Pallas path).  Padded pixels carry hue sentinel -1 and
    match no one-hot row.

    Restructured like the rgb bf16 kernels: cell ids for the whole
    (_ROWS, CHUNK) block at full sublane utilization, bf16 one-hot
    selects, and ONE merged counts GEMM per block (counts are exact
    integer f32 sums in any order, so merging cannot change a bit)."""
    step = pl.program_id(1)
    c = num_cells
    rows = h_ref.shape[1]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, _CHUNK), 0)
    ones = jnp.ones((4, rows * _CHUNK), jnp.bfloat16)

    h8 = h_ref[0]                                         # (_ROWS, CHUNK)
    cells8 = _cell_ids_row(jnp.maximum(h8, 0.0), s_ref[0], v_ref[0], cfg)
    cells8 = jnp.where(h8 >= 0.0, cells8, jnp.int32(-1))
    oh_all = jnp.concatenate(
        [(iota_c == cells8[j:j + 1]).astype(jnp.bfloat16)
         for j in range(rows)], axis=1)                   # (C, rows*CHUNK)
    # 0/1 x 1.0 products are exact in the single bf16 DEFAULT pass;
    # the f32 accumulator keeps counts exact (< 2^24 per cell).
    acc = jax.lax.dot_general(
        oh_all, ones, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def cell_counts_from_hsv(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray,
                         cfg) -> jnp.ndarray:
    """Cell histogram straight from HSV pixels: (B, P) f32 x3 -> (B, C)
    int32, with cell ids computed in-kernel (see _cell_counts_hsv_kernel).

    This is the counts source for every Pallas palette path — the counts
    and the palette sums then share ONE cell-assignment lowering (advisor
    finding: an XLA-vs-Mosaic divide/clip difference on a boundary pixel
    would otherwise silently desync counts vs sums).  Padded pixels must
    carry hue < 0 (the -1 sentinel).  f32 MXU counts are exact below 2^24
    pixels per cell; larger inputs fall back to the XLA compare-reduce
    (which at that size is no longer boundary-sensitive in aggregate —
    and >16.7 MP decimated palette images are outside every supported
    config anyway)."""
    if h.shape[1] > (1 << 24):
        from .quantize import assign_cells, cell_counts
        cells = jax.vmap(lambda a, b2, c2: assign_cells(a, b2, c2, cfg))(
            jnp.maximum(h, 0.0), s, v)
        cells = jnp.where(h >= 0.0, cells, cfg.num_cells)
        return jax.vmap(lambda x: cell_counts(x, cfg.num_cells))(cells)
    b = h.shape[0]
    c = cfg.num_cells
    shaped_h = _shape_pixels(h, -1.0)
    sv = functools.partial(_shape_pixels, fill=0.0)
    t = shaped_h.shape[1] // _ROWS
    pix = pl.BlockSpec((1, _ROWS, _CHUNK), lambda bb, i: (bb, i, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_cell_counts_hsv_kernel, num_cells=c, cfg=cfg),
        grid=(b, t),
        in_specs=[pix, pix, pix],
        out_specs=pl.BlockSpec((1, c, 4), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 4), jnp.float32),
    )(shaped_h, sv(s), sv(v))
    return jnp.round(out[..., 0]).astype(jnp.int32)


def _trunc_split3(x: jnp.ndarray):
    """Exact 3-term bf16 decomposition of f32: x == t1 + t2 + t3 bit-exactly,
    each term exactly representable in bf16.

    Truncating the low 16 bits yields the leading 8 significand bits (bf16
    IS the top half of f32), the residual subtraction is exact (Sterbenz),
    and after two truncations the final residual spans at most 8 significand
    bits — itself bf16-exact.  A dot_general at DEFAULT precision (a single
    bf16 MXU pass here) over these terms against a 0/1 one-hot is therefore
    bit-exact while streaming 6x fewer passes than Precision.HIGHEST.
    (Exact for normal f32 only — denormal inputs may flush in the residual
    subtraction; palette LUT values are ints, hues, and unit fractions.)"""
    mask = np.uint32(0xFFFF0000)
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    t1 = jax.lax.bitcast_convert_type(bits & mask, jnp.float32)
    r = x - t1
    rbits = jax.lax.bitcast_convert_type(r, jnp.uint32)
    t2 = jax.lax.bitcast_convert_type(rbits & mask, jnp.float32)
    return t1, t2, r - t2


def lut_sections(num_cells: int) -> int:
    """Sections in the candidate LUT: candidate slot values are integers
    <= C (sentinel included), exactly representable in ONE bf16 term when
    C <= 256, so the slot quantity needs no 3-way split there — the
    gather GEMM's M dim shrinks from 12*q_pad to 10*q_pad (~17% of the
    palette kernel's dominant MXU cost)."""
    return 10 if num_cells <= 256 else 12


def palette_candidate_lut(assign, tables, num_cells: int,
                          q_pad: int) -> jnp.ndarray:
    """Per-image candidate LUT for the palette kernel, shape
    (lut_sections(C)*q_pad, C).

    Every cell's nearest-parent candidates are exactly its row of
    ``assign.allowed`` (one entry for untied cells — their unique parent;
    the tied set otherwise), so the kernel needs no separate parent/tied
    lookups: it computes the per-pixel distance to each candidate and takes
    the first minimum in valid order, which is the reference's tie rule
    (src/color_quantization.c:376-451) and degenerates to the unique parent
    when there is only one candidate.

    ``q_pad`` (static, from geometry.max_tie_candidates rounded up to a
    sublane multiple) bounds the candidate count: candidates all share one
    distance-rank value, so no cell exceeds the largest equal-rank group.

    Four quantities, each stored bf16-exactly (q_pad rows per term,
    indexed [q, cell]; sentinel slots: k = C, centers 0): candidate slot
    k (ascending) — ONE term when C <= 256 (small integers are bf16-
    exact), the 3-term truncation split otherwise — then center hue,
    sat, val as exact 3-term decompositions.  The sections let the
    kernel gather everything with ONE single-pass bf16 GEMM against the
    cell one-hot, bit-exactly (see _trunc_split3); the hue offset is
    recomputed in-kernel as 180 - center_hue, the same f32 subtraction
    the XLA path applies to the same center value.
    """
    from .quantize import candidate_slots

    c = num_cells
    order = assign.order
    centers_by_k = tables.centers[order].astype(jnp.float32)   # (C, 3)
    cand_k = candidate_slots(assign, c, q_pad)                 # ascending k
    safe = jnp.minimum(cand_k, c - 1)
    real = (cand_k < c).astype(jnp.float32)                    # (C, q_pad)
    candf = cand_k.astype(jnp.float32)
    sections = [candf] if lut_sections(c) == 10 \
        else list(_trunc_split3(candf))
    for qty in (centers_by_k[safe, 0] * real,
                centers_by_k[safe, 1] * real,
                centers_by_k[safe, 2] * real):
        sections.extend(_trunc_split3(qty))
    return jnp.concatenate([sec.T for sec in sections], axis=0)


def _decode_lut(lu: jnp.ndarray, q: int, num_cells: int):
    """Recombine the gathered LUT sections -> (candk, ch, cs, cv), each
    (q, chunk).  Section layout must match palette_candidate_lut."""
    o = 1 if lut_sections(num_cells) == 10 else 3
    candk = lu[0:q] if o == 1 else lu[0:q] + lu[q:2 * q] + lu[2 * q:3 * q]
    ch = lu[o * q:(o + 1) * q] + lu[(o + 1) * q:(o + 2) * q] \
        + lu[(o + 2) * q:(o + 3) * q]
    cs = lu[(o + 3) * q:(o + 4) * q] + lu[(o + 4) * q:(o + 5) * q] \
        + lu[(o + 5) * q:(o + 6) * q]
    cv = lu[(o + 6) * q:(o + 7) * q] + lu[(o + 7) * q:(o + 8) * q] \
        + lu[(o + 8) * q:(o + 9) * q]
    return candk, ch, cs, cv


def _cell_ids_row(hrow, srow, vrow, cfg) -> jnp.ndarray:
    """In-kernel replica of quantize.assign_cells for one pixel row
    (reference src/color_quantization.c:127-145, incl. the premature-int-
    cast gray collapse).  All constants are Python floats/ints (Mosaic
    rejects captured jnp scalars).  Computing the cell id from the h/s/v
    rows the kernel already loads skips the (B, P) int32 cells array in
    HBM entirely (an 8 B/px write+read on the XLA side)."""
    black = float(cfg.black_thresh)
    gray = float(cfg.gray_thresh)
    # Same op sequence as assign_cells (division, not reciprocal-multiply)
    # so cell boundaries resolve identically to the XLA histogram pass.
    # RISK (on-chip validated by tools/tpu_parity_check.py "palette pct
    # exact"): if Mosaic ever lowered this divide/clip differently from
    # XLA:TPU, a boundary pixel could land in different cells for counts
    # vs sums; interpret mode cannot catch that (shared CPU lowering).
    vi = jnp.clip((vrow - black) / float(cfg.cell_Lv), 0.0,
                  cfg.v_partitions - 1e-6).astype(jnp.int32)
    si = jnp.clip((srow - gray) / float(cfg.cell_Ls), 0.0,
                  cfg.s_partitions - 1e-6).astype(jnp.int32)
    hi = jnp.clip(hrow / float(cfg.cell_Lh), 0.0,
                  cfg.h_partitions - 1e-6).astype(jnp.int32)
    color_id = (hi * cfg.s_partitions + si) * cfg.v_partitions + vi
    return jnp.where(vrow < black, cfg.black_id,
                     jnp.where(srow < gray, cfg.gray_start, color_id))


def _palette_kernel(h_ref, s_ref, v_ref, lut_ref, out_ref, *,
                    num_cells: int, q_pad: int, cfg):
    """Per-pixel parent resolution + palette sums, tie-exact and branchless.

    Per 1024-pixel row: one single-pass bf16 GEMM gathers all candidate
    tables bit-exactly (the LUT rows are bf16-exact split terms), the
    distance/argmin math runs on (q_pad, CHUNK) arrays — q_pad (typically
    40) sublane rows instead of C (112) — and the palette sums go out
    through a second single-pass GEMM whose value rows are bf16-split
    (exact 0/1 count column; hue/sat/val sums exact per product).  The two
    GEMMs streaming one pass instead of Precision.HIGHEST's six is worth
    ~2x on the whole kernel.  Cell ids are computed in-kernel from the
    h/s/v rows (padded pixels carry the hue sentinel -1).

    Issue-efficiency restructuring (shared with the rgb bf16 kernels):
    sentinel masks, cell ids, and value splits are computed once per
    (_ROWS, CHUNK) block at full sublane utilization and statically
    sliced per row; one-hots are materialized in bf16 (the dtype the
    DEFAULT-precision MXU pass ingests anyway — bit-identical products,
    half the vreg writes; compares stay int32/f32, this target has no
    bf16 compare).  The block's 8 sums GEMMs merge into ONE K=8192
    contraction — and this PRESERVES the exact padding-invariance the
    sharded body relies on (test_palette_kernels_drop_hue_sentinel_
    pixels): _shape_pixels always pads inputs to whole (_ROWS, _CHUNK)
    blocks, so the merged reduction tree has identical structure with or
    without sentinel tails, whose one-hot columns are exactly zero."""
    step = pl.program_id(1)
    c = num_cells
    q = q_pad
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, _CHUNK), 0)
    iota_cf = iota_c.astype(jnp.float32)
    split3 = _split3
    lut = lut_ref[0].astype(jnp.bfloat16)                 # bf16-exact rows

    h8 = h_ref[0]                                         # (_ROWS, CHUNK)
    s8 = s_ref[0]
    v8 = v_ref[0]
    in8 = (h8 >= 0.0).astype(jnp.float32)
    hc8 = jnp.maximum(h8, 0.0)
    cells8 = _cell_ids_row(hc8, s8, v8, cfg)
    sp = split3(s8 * in8)
    vp = split3(v8 * in8)

    ohs, vls = [], []
    for j in range(h_ref.shape[1]):
        hrow = hc8[j:j + 1]                               # (1, CHUNK)
        srow = s8[j:j + 1]
        vrow = v8[j:j + 1]
        in_img = in8[j:j + 1]
        oh_c = (iota_c == cells8[j:j + 1]).astype(jnp.bfloat16)
        # All candidate lookups in one single-pass bf16 GEMM: every LUT row
        # is bf16-exact and the one-hot is 0/1, so each product is exact and
        # each output element has exactly one contributing term.
        lu = jax.lax.dot_general(
            lut, oh_c, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (ns*q, CHUNK)
        candk, ch, cs, cv = _decode_lut(lu, q, c)
        # Distance to each candidate; identical f32 ops to the XLA
        # pixel pass (quantize.palette_pixel_sums), so ties break
        # bit-identically.
        hd = jnp.abs(hrow - ch)                           # (q, CHUNK)
        hd = jnp.where(hd > 180.0, 360.0 - hd, hd) * jnp.float32(1 / 360.0)
        sd = srow - cs
        vd = vrow - cv
        d = hd * hd + sd * sd + vd * vd
        dm = jnp.where(candk < jnp.float32(c), d, jnp.float32(_BIG))
        minv = jnp.min(dm, axis=0, keepdims=True)
        iskmin = dm == minv
        # First minimum in valid order == smallest candidate k (ascending).
        kstar = jnp.min(jnp.where(iskmin, candk, jnp.float32(c)), axis=0,
                        keepdims=True)
        chosen = jnp.logical_and(iskmin, candk == kstar)  # one row per pixel
        # Offset of the chosen parent: the same f32 "180 - center_hue" the
        # XLA path computes (sentinel rows only sum for padded pixels,
        # which in_img zeroes below).
        off = jnp.sum(jnp.where(chosen, jnp.float32(180.0) - ch, 0.0),
                      axis=0, keepdims=True)
        kfin = jnp.where(in_img > 0.5, kstar, jnp.float32(c))
        oh_k = (iota_cf == kfin).astype(jnp.bfloat16)
        temp = hrow + off
        temp = jnp.where(temp > 360.0, temp - 360.0,
                         jnp.where(temp < 0.0, temp + 360.0, temp))
        t1, t2, t3 = split3(temp * in_img)
        vals = jnp.concatenate(
            [in_img, t1, t2, t3,
             sp[0][j:j + 1], sp[1][j:j + 1], sp[2][j:j + 1],
             vp[0][j:j + 1], vp[1][j:j + 1], vp[2][j:j + 1],
             jnp.zeros((6, _CHUNK), jnp.float32)], axis=0)  # (16, CHUNK)
        ohs.append(oh_k)
        vls.append(vals.astype(jnp.bfloat16))
    acc = jax.lax.dot_general(
        jnp.concatenate(ohs, axis=1), jnp.concatenate(vls, axis=1),
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # (C, 16), 1 pass

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def palette_sums_by_k(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray,
                      luts: jnp.ndarray, num_cells: int, q_pad: int,
                      cfg) -> jnp.ndarray:
    """Palette sums per valid-order slot: (B, P) pixels -> (B, C, 4) f32 of
    [sum wrapped-hue, sum s, sum v, count] — the valid_parents layout that
    quantize.palette_finalize_by_k consumes.  ``luts`` is the batched
    (B, lut_sections(C)*q_pad, C) output of palette_candidate_lut.  Cell ids are
    recomputed in-kernel (_cell_ids_row) — no (B, P) cells input; padded
    pixels are marked by the hue fill sentinel -1."""
    b = h.shape[0]
    c = num_cells
    shaped_h = _shape_pixels(h, -1.0)
    sv = functools.partial(_shape_pixels, fill=0.0)
    t = shaped_h.shape[1] // _ROWS

    pix = pl.BlockSpec((1, _ROWS, _CHUNK), lambda bb, i: (bb, i, 0),
                       memory_space=pltpu.VMEM)
    lut = pl.BlockSpec((1, lut_sections(c) * q_pad, c), lambda bb, i: (bb, 0, 0),
                       memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_palette_kernel, num_cells=c, q_pad=q_pad,
                          cfg=cfg),
        grid=(b, t),
        in_specs=[pix, pix, pix, lut],
        out_specs=pl.BlockSpec((1, c, 16), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 16), jnp.float32),
    )(shaped_h, sv(s), sv(v), luts)
    return _recombine_split_sums(out)


# ---------------------------------------------------------------------------
# rgb-native palette kernels (in-kernel HSV, zero input marshalling)
# ---------------------------------------------------------------------------
#
# The flat (B, P) kernels above require flatten -> pad -> reshape input
# marshalling that XLA materializes as full-plane pad + layout copies
# (~36 B/px of extra HBM writes measured by tools/hlo_cost.py at 1080p).
# When the (downsampled) image shape is already tile-aligned — H a
# multiple of 8 sublanes, W a multiple of 128 lanes, true for every
# flagship resolution — the kernels can instead read the planarized
# (B, 3, H, W) float32 rgb directly and compute HSV in-kernel, so the
# h/s/v planes never exist in HBM at all (they were written and re-read
# only to feed these kernels; the sole other consumer, mean saturation,
# is accumulated here too).
#
# Parity: _hsv_rows is op-for-op identical to colorspace.rgb_to_hsv, and
# counts + sums share the ONE Mosaic lowering of it (same rule as
# _cell_ids_row: a divide-lowering difference vs XLA:TPU cannot desync
# counts against sums, and tools/tpu_parity_check.py gates the
# Mosaic-vs-XLA agreement on real hardware).


def _lane_chunk(w: int, max_lanes: int = 2048) -> int:
    """Largest 128-multiple divisor of ``w`` that is <= ``max_lanes``.

    Bounds the per-row-chunk VMEM intermediates (the (ns*q_pad, chunk)
    gather GEMM output dominates).  2048 lanes measured ~1.5 ms faster
    than 1024 on the fused batch-16 program (fewer, larger gathers and
    one-hot builds); the wide q=40 tier keeps 1024 — its (~400, chunk)
    f32 gather output would reach ~3.3 MB per chunk at 2048, crowding
    VMEM next to the merged-sums buffers."""
    best = 0
    for lanes in range(128, min(w, max_lanes) + 1, 128):
        if w % lanes == 0:
            best = lanes
    return best


def palette_rgb_eligible(h: int, w: int) -> bool:
    """True when (h, w) images can use the rgb-native kernels: no padding
    (8-sublane rows, 128-lane columns) and f32 MXU counts stay exact
    (< 2^24 pixels per cell)."""
    return h % _ROWS == 0 and w % 128 == 0 and h * w <= (1 << 24) \
        and _lane_chunk(w) >= 128


def _hsv_rows(r, g, b):
    """In-kernel HSV, op-for-op identical to colorspace.rgb_to_hsv
    (reference src/image_processing.c:372-417) so the f32 results match
    the XLA path bit-for-bit under an IEEE lowering.  Constants are
    Python floats (Mosaic rejects captured jnp scalars); 0.999999 is
    config.MAX_SATURATION / MAX_VALUE."""
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    delta = mx - mn
    safe = jnp.where(delta == 0.0, 1.0, delta)
    h = jnp.where(
        delta == 0.0,
        0.0,
        jnp.where(
            mx == r,
            60.0 * ((g - b) / safe),
            jnp.where(mx == g, 60.0 * (2.0 + (b - r) / safe),
                      60.0 * (4.0 + (r - g) / safe)),
        ),
    )
    h = jnp.where(h < 0.0, h + 360.0, h)
    h = jnp.where(h > 360.0, h - 360.0, h)
    v = jnp.where(mx == 1.0, 0.999999, mx)
    safe_mx = jnp.where(mx == 0.0, 1.0, mx)
    s = jnp.where(mx == 0.0, 0.0,
                  jnp.where(delta == mx, 0.999999, delta / safe_mx))
    return h, s, v


def _rgb_rows(rgb_ref, j, sl):
    rrow = rgb_ref[0, 0, pl.ds(j, 1), sl]
    grow = rgb_ref[0, 1, pl.ds(j, 1), sl]
    brow = rgb_ref[0, 2, pl.ds(j, 1), sl]
    return _hsv_rows(rrow, grow, brow)


def _cell_counts_rgb_kernel(rgb_ref, out_ref, *, num_cells: int, cfg,
                            wc: int):
    """Histogram + saturation sum from rgb rows.  Output (C, 4): column 0
    exact counts (0/1 x 1.0 products), columns 1-3 the bf16-split
    saturation sums (mean_saturation's numerator, ~2^-24-exact)."""
    step = pl.program_id(1)
    c = num_cells
    w = rgb_ref.shape[3]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    ones = jnp.ones((1, wc), jnp.float32)

    def row(j, acc):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            hrow, srow, vrow = _rgb_rows(rgb_ref, j, sl)
            crow = _cell_ids_row(hrow, srow, vrow, cfg)
            oh_c = (iota_c == crow).astype(jnp.float32)
            s1, s2, s3 = _split3(srow)
            vals = jnp.concatenate([ones, s1, s2, s3], axis=0)  # (4, wc)
            acc = acc + jax.lax.dot_general(
                oh_c, vals, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        return acc

    acc = jax.lax.fori_loop(0, rgb_ref.shape[2], row,
                            jnp.zeros((c, 4), jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def cell_counts_s_from_rgb(rgb: jnp.ndarray, cfg):
    """(B, 3, H, W) f32 rgb -> ((B, C) int32 cell counts, (B,) f32 sum of
    the saturation channel).  Requires palette_rgb_eligible(H, W)."""
    b, _, hh, ww = rgb.shape
    c = cfg.num_cells
    wc = _lane_chunk(ww)
    out = pl.pallas_call(
        functools.partial(_cell_counts_rgb_kernel, num_cells=c, cfg=cfg,
                          wc=wc),
        grid=(b, hh // _ROWS),
        in_specs=[pl.BlockSpec((1, 3, _ROWS, ww),
                               lambda bb, i: (bb, 0, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, c, 4), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 4), jnp.float32),
    )(rgb)
    counts = jnp.round(out[..., 0]).astype(jnp.int32)
    s_sum = jnp.sum(out[..., 1] + out[..., 2] + out[..., 3], axis=-1)
    return counts, s_sum


def palette_offset_lut(assign, tables, num_cells: int) -> jnp.ndarray:
    """(3, C) LUT for the q=1 kernel: the exact 3-term bf16 split of each
    CELL's hue offset 180 - center_hue(parent-of-cell).

    Valid only on the q=1 tier (no populated cell tied): every pixel's
    parent is then a pure function of its cell, so the kernel needs no
    per-pixel candidate distances at all — just this offset gather.  The
    same f32 "180 - center_hue" the XLA path and the wide kernel compute."""
    c = num_cells
    from .quantize import candidate_slots

    k1 = candidate_slots(assign, c, 1)[:, 0]              # (C,) slot per cell
    off = 180.0 - tables.centers[assign.order][
        jnp.minimum(k1, c - 1), 0].astype(jnp.float32)    # (C,)
    t1, t2, t3 = _trunc_split3(off)
    return jnp.stack([t1, t2, t3], axis=0)                # (3, C)


def parent_slot_matrix(assign, num_cells: int) -> jnp.ndarray:
    """(C, C) 0/1 remap P with P[k, cell] = 1 iff cell's unique parent is
    valid-order slot k.  sums_by_k = P @ sums_by_cell (q=1 tier)."""
    c = num_cells
    from .quantize import candidate_slots

    k1 = candidate_slots(assign, c, 1)[:, 0]              # (C,)
    iota_k = jnp.arange(c, dtype=jnp.int32)
    return (iota_k[:, None] == k1[None, :]).astype(jnp.float32)


def _palette_rgb_q1_kernel(rgb_ref, lut_ref, out_ref, *, num_cells: int,
                           cfg, wc: int):
    """q=1 palette pass: no populated cell is tied, so the per-pixel
    parent is a pure cell lookup.  Sums accumulate BY CELL through the
    one one-hot the kernel already builds (the caller remaps cell -> slot
    with parent_slot_matrix): the (12*q_pad, C) candidate gather, the
    distance/argmin math, and the second (slot) one-hot compare all
    disappear.  MXU work drops from ~12.5k to ~3.7k MAC/px."""
    step = pl.program_id(1)
    c = num_cells
    w = rgb_ref.shape[3]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    ones = jnp.ones((1, wc), jnp.float32)
    split3 = _split3

    def row(j, acc):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            hrow, srow, vrow = _rgb_rows(rgb_ref, j, sl)
            crow = _cell_ids_row(hrow, srow, vrow, cfg)
            oh_c = (iota_c == crow).astype(jnp.float32)   # (C, wc)
            lu = jax.lax.dot_general(
                lut_ref[0], oh_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (3, wc)
            off = lu[0:1] + lu[1:2] + lu[2:3]             # (1, wc) exact
            temp = hrow + off
            temp = jnp.where(temp > 360.0, temp - 360.0,
                             jnp.where(temp < 0.0, temp + 360.0, temp))
            t1, t2, t3 = split3(temp)
            s1, s2, s3 = split3(srow)
            v1, v2, v3 = split3(vrow)
            vals = jnp.concatenate(
                [ones, t1, t2, t3, s1, s2, s3, v1, v2, v3,
                 jnp.zeros((6, wc), jnp.float32)], axis=0)  # (16, wc)
            acc = acc + jax.lax.dot_general(
                oh_c, vals, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (C, 16) by cell
        return acc

    acc = jax.lax.fori_loop(0, rgb_ref.shape[2], row,
                            jnp.zeros((c, 16), jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def palette_sums_by_k_rgb_q1(rgb: jnp.ndarray, assign, tables,
                             num_cells: int, cfg) -> jnp.ndarray:
    """q=1-tier palette sums from rgb: (B, 3, H, W) -> (B, C, 4) in the
    valid-order-slot layout (same contract as palette_sums_by_k_rgb).
    Callers must guarantee the q=1 predicate (no populated cell tied);
    then every result is identical to the wide kernel's, with the per-bin
    additions reassociated (counts stay exact integer f32 sums; hue/s/v
    sums differ by f32 rounding order only, like any shard split)."""
    b, _, hh, ww = rgb.shape
    c = num_cells
    wc = _lane_chunk(ww)
    luts = jax.vmap(
        lambda a: palette_offset_lut(a, tables, c))(assign)  # (B, 3, C)
    out = pl.pallas_call(
        functools.partial(_palette_rgb_q1_kernel, num_cells=c, cfg=cfg,
                          wc=wc),
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
    )(rgb, luts)
    by_cell = _recombine_split_sums(out)                  # (B, C, 4)
    perm = jax.vmap(lambda a: parent_slot_matrix(a, c))(assign)
    # 0/1 x f32 products are exact; HIGHEST keeps the K=C contraction's
    # f32 adds unrounded (each output element sums disjoint cell rows).
    return jnp.einsum("bkc,bcq->bkq", perm, by_cell,
                      precision=jax.lax.Precision.HIGHEST)


def _palette_rgb_kernel(rgb_ref, lut_ref, out_ref, *, num_cells: int,
                        q_pad: int, cfg, wc: int):
    """Per-pixel parent resolution + palette sums from rgb rows.  The
    distance/argmin/tie math is identical to _palette_kernel; hsv comes
    from _hsv_rows and every pixel is real (no pad sentinels on this
    path), so the in_img machinery drops out."""
    step = pl.program_id(1)
    c = num_cells
    q = q_pad
    w = rgb_ref.shape[3]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    ones = jnp.ones((1, wc), jnp.float32)
    split3 = _split3

    def row(j, acc):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            hrow, srow, vrow = _rgb_rows(rgb_ref, j, sl)
            crow = _cell_ids_row(hrow, srow, vrow, cfg)
            oh_c = (iota_c == crow).astype(jnp.float32)
            lu = jax.lax.dot_general(
                lut_ref[0], oh_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)       # (ns*q, wc)
            candk, ch, cs, cv = _decode_lut(lu, q, c)
            hd = jnp.abs(hrow - ch)                       # (q, wc)
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
            oh_k = (iota_c == kstar.astype(jnp.int32)).astype(jnp.float32)
            temp = hrow + off
            temp = jnp.where(temp > 360.0, temp - 360.0,
                             jnp.where(temp < 0.0, temp + 360.0, temp))
            t1, t2, t3 = split3(temp)
            s1, s2, s3 = split3(srow)
            v1, v2, v3 = split3(vrow)
            vals = jnp.concatenate(
                [ones, t1, t2, t3, s1, s2, s3, v1, v2, v3,
                 jnp.zeros((6, wc), jnp.float32)], axis=0)  # (16, wc)
            acc = acc + jax.lax.dot_general(
                oh_k, vals, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)       # (C, 16)
        return acc

    acc = jax.lax.fori_loop(0, rgb_ref.shape[2], row,
                            jnp.zeros((c, 16), jnp.float32))

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def palette_sums_by_k_rgb(rgb: jnp.ndarray, luts: jnp.ndarray,
                          num_cells: int, q_pad: int, cfg) -> jnp.ndarray:
    """Palette sums per valid-order slot straight from (B, 3, H, W) rgb:
    -> (B, C, 4) f32 [sum wrapped-hue, sum s, sum v, count].  Same output
    contract as palette_sums_by_k; requires palette_rgb_eligible(H, W)."""
    b, _, hh, ww = rgb.shape
    c = num_cells
    wc = _lane_chunk(ww, 1024 if q_pad > 8 else 2048)
    out = pl.pallas_call(
        functools.partial(_palette_rgb_kernel, num_cells=c, q_pad=q_pad,
                          cfg=cfg, wc=wc),
        grid=(b, hh // _ROWS),
        in_specs=[
            pl.BlockSpec((1, 3, _ROWS, ww), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lut_sections(c) * q_pad, c), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 16), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 16), jnp.float32),
    )(rgb, luts)
    return _recombine_split_sums(out)


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
