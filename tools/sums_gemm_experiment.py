"""On-chip experiment: formulations of the palette sums GEMM.

kernel_cost_probe.py attributes ~14.5 ms of the 33-MP wide-kernel wall to
the per-chunk (C, wc) x (wc, 16) sums contraction (N=16: the MXU mostly
idles, and it is issued 24x per block).  Candidates:

  a. per-chunk (baseline, production shape)
  b. block-merged: accumulate the 24 chunks' one-hots/values and issue ONE
     (C, 24*wc) x (24*wc, 16) GEMM per block
  c. row-merged: one (C, W) x (W, 16) GEMM per row (3 chunks)

Each variant runs the REAL kernel computation up to the sums (gather,
distances, tie-break) so scheduling interactions are included; outputs are
identical across variants (same products, reassociated adds of exact terms
only for counts... counts are exact in any order; hue/s/v sums reassociate
like any shard split).
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from photohive_dsp_tpu.config import ReportConfig
from photohive_dsp_tpu.ops import pallas_kernels as pk
from photohive_dsp_tpu.ops.pallas_kernels import (_BIG, _ROWS, _lane_chunk,
                                                  _split3, lut_sections)
from photohive_dsp_tpu.ops.pallas_kernels_bf16 import (_decode_lut_f32,
                                                       _hsv_cells_block,
                                                       _onehot_bf16)
from photohive_dsp_tpu.ops.quantize import (OctreeTables, saliency_f32,
                                            saliency_argsort,
                                            parent_assignment_from_order)


# the library's digit-plane encoder/scales: the experiment must measure
# the SAME encoding production ships (self-review r5)
from photohive_dsp_tpu.ops.pallas_kernels_bf16 import (_HUE_SCALE,  # noqa: E402
                                                       _SV_SCALE, _digits4)


def _kernel(rgb_ref, lut_ref, out_ref, *, num_cells, q_pad, cfg, wc, mode):
    step = pl.program_id(1)
    c = num_cells
    q = q_pad
    w = rgb_ref.shape[3]
    rows = rgb_ref.shape[2]
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (c, wc), 0)
    iota_cf = iota_c.astype(jnp.float32)
    ones = jnp.ones((1, wc), jnp.float32)
    lut = lut_ref[0]

    h8, s8, v8, c8 = _hsv_cells_block(rgb_ref, cfg)
    sp = _split3(s8)
    vp = _split3(v8)

    n_out = {"block32": 32}.get(mode, 16)
    if mode in ("i8fix", "i8split2"):
        acc = jnp.zeros((c, 16), jnp.int32)
    elif mode in ("tpose", "tpose_block"):
        acc = jnp.zeros((16, c), jnp.float32)
    else:
        acc = jnp.zeros((c, n_out), jnp.float32)
    ohs, vls = [], []
    for j in range(rows):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            hrow = h8[j:j + 1, sl]
            srow = s8[j:j + 1, sl]
            vrow = v8[j:j + 1, sl]
            oh_c = _onehot_bf16(iota_c, c8[j:j + 1, sl])
            lu = jax.lax.dot_general(
                lut, oh_c, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            candk, ch, cs, cv = _decode_lut_f32(lu, q, c)
            hd = jnp.abs(hrow - ch)
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
            oh_k = (iota_cf == kstar).astype(jnp.bfloat16)
            temp = hrow + off
            temp = jnp.where(temp > 360.0, temp - 360.0,
                             jnp.where(temp < 0.0, temp + 360.0, temp))
            t1, t2, t3 = _split3(temp)
            vals = jnp.concatenate(
                [ones, t1, t2, t3,
                 sp[0][j:j + 1, sl], sp[1][j:j + 1, sl],
                 sp[2][j:j + 1, sl],
                 vp[0][j:j + 1, sl], vp[1][j:j + 1, sl],
                 vp[2][j:j + 1, sl],
                 jnp.zeros((6, wc), jnp.float32)], axis=0)
            if mode == "chunk":
                acc = acc + jax.lax.dot_general(
                    oh_k, vals.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)
            elif mode == "block32":
                # N=32 output: the isolated probe measured t(N=32) <
                # t(N=16) at the sums shape (tools/nfill_probe)
                vals32 = jnp.concatenate(
                    [vals, jnp.zeros((16, wc), jnp.float32)], axis=0)
                ohs.append(oh_k)
                vls.append(vals32.astype(jnp.bfloat16))
                if j == rows - 1 and k0 == w // wc - 1:
                    acc = acc + jax.lax.dot_general(
                        jnp.concatenate(ohs, axis=1),
                        jnp.concatenate(vls, axis=1),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ohs, vls = [], []
            elif mode in ("i8fix", "i8split2"):
                # int8 digit-plane sums: one-hot int8 x 4-digit base-128
                # fixed-point vals, int32 accumulator.  Per-product
                # exact, accumulation int32-EXACT (the bf16 form rounds
                # every f32 add); only sub-2^-4-of-range values truncate
                # (<= 1/scale abs per px).  int8 MXU measured 1.7x bf16.
                oh_i8 = (iota_cf == kstar).astype(jnp.int8)
                hd4 = _digits4(temp, _HUE_SCALE)
                sd4 = _digits4(s8[j:j + 1, sl], _SV_SCALE)
                vd4 = _digits4(v8[j:j + 1, sl], _SV_SCALE)
                vals_i8 = jnp.concatenate(
                    [jnp.ones((1, wc), jnp.int8)]
                    + [d.reshape(1, wc) for d in hd4]
                    + [d.reshape(1, wc) for d in sd4]
                    + [d.reshape(1, wc) for d in vd4]
                    + [jnp.zeros((3, wc), jnp.int8)], axis=0)  # (16, wc)
                ohs.append(oh_i8)
                vls.append(vals_i8)
                flush = (j == rows - 1 and k0 == w // wc - 1)
                if mode == "i8split2":
                    flush = flush or len(ohs) == (rows * (w // wc)) // 2
                if flush:
                    acc = acc + jax.lax.dot_general(
                        jnp.concatenate(ohs, axis=1),
                        jnp.concatenate(vls, axis=1),
                        (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    ohs, vls = [], []
            elif mode in ("row", "block", "split2", "split4"):
                ohs.append(oh_k)
                vls.append(vals.astype(jnp.bfloat16))
                nchunks = rows * (w // wc)
                flush = (j == rows - 1 and k0 == w // wc - 1)
                if mode == "row":
                    flush = len(ohs) == w // wc
                elif mode == "split2":
                    flush = flush or len(ohs) == nchunks // 2
                elif mode == "split4":
                    flush = flush or len(ohs) >= -(-nchunks // 4)
                if flush:
                    oh_all = jnp.concatenate(ohs, axis=1)
                    vl_all = jnp.concatenate(vls, axis=1)
                    acc = acc + jax.lax.dot_general(
                        oh_all, vl_all, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    ohs, vls = [], []
            elif mode in ("tpose", "tpose_block"):
                # One-hot built TRANSPOSED (pixels on sublanes) from a tiny
                # (1, wc) -> (wc, 1) kstar transpose; both GEMM operands are
                # then in natural (M, K) x (K, N) form — no big relayout.
                # acc is (16, C) in this mode (caller transposes once).
                kstar_t = jax.lax.transpose(kstar, (1, 0))     # (wc, 1)
                iota_t = jax.lax.broadcasted_iota(
                    jnp.int32, (wc, c), 1).astype(jnp.float32)
                oh_k_t = (iota_t == kstar_t).astype(jnp.bfloat16)
                if mode == "tpose":
                    acc = acc + jax.lax.dot_general(
                        vals.astype(jnp.bfloat16), oh_k_t,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # (16, C)
                else:
                    ohs.append(oh_k_t)
                    vls.append(vals.astype(jnp.bfloat16))
                    if j == rows - 1 and k0 == w // wc - 1:
                        oh_all = jnp.concatenate(ohs, axis=0)  # (24wc, C)
                        vl_all = jnp.concatenate(vls, axis=1)  # (16, 24wc)
                        acc = acc + jax.lax.dot_general(
                            vl_all, oh_all, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        ohs, vls = [], []

    if mode in ("tpose", "tpose_block"):
        acc = jax.lax.transpose(acc, (1, 0))   # (16, C) -> (C, 16), tiny

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def _summarize(out, mode):
    """(B, C, n_out) raw kernel output -> (B, C, 4) [count, hue, s, v]
    sums, mode-appropriately recombined, for cross-mode comparison."""
    out = np.asarray(out, np.float64)
    if mode in ("i8fix", "i8split2"):
        def dig(c0):
            return (out[..., c0] + out[..., c0 + 1] * 128.0
                    + out[..., c0 + 2] * 128.0 ** 2
                    + out[..., c0 + 3] * 128.0 ** 3)
        return np.stack([out[..., 0], dig(1) / _HUE_SCALE,
                         dig(5) / _SV_SCALE, dig(9) / _SV_SCALE], -1)
    return np.stack([out[..., 0], out[..., 1:4].sum(-1),
                     out[..., 4:7].sum(-1), out[..., 7:10].sum(-1)], -1)


def run(rgb, luts, c, q, cfg, mode):
    b, _, hh, ww = rgb.shape
    wc = _lane_chunk(ww)
    n_out = {"block32": 32}.get(mode, 16)
    out_dt = jnp.int32 if mode in ("i8fix", "i8split2") else jnp.float32
    # Block height (grid-step rows): EXP_ROWS env overrides the prod 8 —
    # "fewer larger blocks" probes per-step overhead vs VMEM pressure.
    rows = int(os.environ.get("EXP_ROWS", str(_ROWS)))
    fn = jax.jit(lambda r, l: pl.pallas_call(
        functools.partial(_kernel, num_cells=c, q_pad=q, cfg=cfg, wc=wc,
                          mode=mode),
        grid=(b, hh // rows),
        in_specs=[
            pl.BlockSpec((1, 3, rows, ww), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lut_sections(c) * q, c),
                         lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, n_out), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, n_out), out_dt),
    )(r, l.astype(jnp.bfloat16)))
    out = np.asarray(fn(rgb, luts))  # compile+warm
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(fn(rgb, luts))
        ts.append(time.perf_counter() - t0)
    return min(ts), _summarize(out, mode)


def main():
    h, w, b = 1080, 1920, 16
    if len(sys.argv) >= 4:
        h, w, b = map(int, sys.argv[1:4])
    cfg = ReportConfig()
    tables = OctreeTables.for_config(cfg)
    c = cfg.num_cells
    q = 8
    rng = np.random.default_rng(0)
    rgb = jax.device_put(rng.random((b, 3, h, w)).astype(np.float32))
    counts, _ = pk.cell_counts_s_from_rgb(rgb, cfg)
    sal = jax.vmap(lambda x: saliency_f32(x, tables.s_v_f32, cfg))(counts)
    order = saliency_argsort(sal, True)
    assign = jax.vmap(lambda cnt, o: parent_assignment_from_order(
        cnt, o, h * w, cfg, tables))(counts, order)
    luts = jax.vmap(lambda a: pk.palette_candidate_lut(
        a, tables, c, q))(assign)
    luts = jax.device_put(np.asarray(luts))

    ref = None
    modes = sys.argv[4].split(",") if len(sys.argv) >= 5 \
        else ("block", "block32", "split2", "i8fix")
    for mode in modes:
        try:
            t, out = run(rgb, luts, c, q, cfg, mode)
        except Exception as exc:  # noqa: BLE001
            print(f"  {mode:<6} FAILED {type(exc).__name__}: "
                  f"{str(exc)[:120]}", flush=True)
            continue
        if ref is None:
            ref = out
            tag = "(ref)"
        else:
            tag = "MATCH" if np.allclose(ref, out, rtol=1e-6, atol=1e-3) \
                else "** MISMATCH **"
        print(f"  {mode:<6} {t*1e3:7.1f} ms  {tag}", flush=True)


if __name__ == "__main__":
    main()
