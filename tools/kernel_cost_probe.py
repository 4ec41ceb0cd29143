"""Decompose the wide (q=8) rgb palette kernel's on-chip cost by ablation.

Each variant deletes ONE piece of the kernel's work (replacing it with a
shape-compatible constant so the rest still executes); the delta against
the full kernel attributes the cost.  Results are NOT parity-correct —
this is a measurement scalpel only, never a production path.

Run on the chip: python tools/kernel_cost_probe.py [H W B]
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
                                                  lut_sections)
from photohive_dsp_tpu.ops.pallas_kernels_bf16 import (_decode_lut_f32,
                                                       _hsv_cells_block,
                                                       _onehot_bf16)
from photohive_dsp_tpu.ops.quantize import (OctreeTables, saliency_f32,
                                            saliency_argsort,
                                            parent_assignment_from_order)

from photohive_dsp_tpu.ops.pallas_kernels import _split3


def _probe_kernel(rgb_ref, lut_ref, out_ref, *, num_cells, q_pad, cfg, wc,
                  skip):
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

    acc = jnp.zeros((c, 16), jnp.float32)
    for j in range(rows):
        for k0 in range(w // wc):
            sl = slice(k0 * wc, (k0 + 1) * wc)
            hrow = h8[j:j + 1, sl]
            srow = s8[j:j + 1, sl]
            vrow = v8[j:j + 1, sl]
            if "ohc" in skip:
                oh_c = jnp.full((c, wc), 0.25, jnp.bfloat16) \
                    + c8[j:j + 1, sl].astype(jnp.bfloat16) * 0
            else:
                oh_c = _onehot_bf16(iota_c, c8[j:j + 1, sl])
            if "gather" in skip:
                lu = jnp.zeros((lut.shape[0], wc), jnp.float32) \
                    + oh_c[0:1].astype(jnp.float32)
            else:
                lu = jax.lax.dot_general(
                    lut, oh_c, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            candk, ch, cs, cv = _decode_lut_f32(lu, q, c)
            if "dist" in skip:
                kstar = candk[0:1]
                off = ch[0:1]
            else:
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
                off = jnp.sum(
                    jnp.where(chosen, jnp.float32(180.0) - ch, 0.0),
                    axis=0, keepdims=True)
            if "ohk" in skip:
                oh_k = oh_c + kstar.astype(jnp.bfloat16) * 0
            else:
                oh_k = (iota_cf == kstar).astype(jnp.bfloat16)
            temp = hrow + off
            temp = jnp.where(temp > 360.0, temp - 360.0,
                             jnp.where(temp < 0.0, temp + 360.0, temp))
            t1, t2, t3 = _split3(temp)
            if "vals" in skip:
                vals = jnp.zeros((16, wc), jnp.float32) + t1
            else:
                vals = jnp.concatenate(
                    [ones, t1, t2, t3,
                     sp[0][j:j + 1, sl], sp[1][j:j + 1, sl],
                     sp[2][j:j + 1, sl],
                     vp[0][j:j + 1, sl], vp[1][j:j + 1, sl],
                     vp[2][j:j + 1, sl],
                     jnp.zeros((6, wc), jnp.float32)], axis=0)
            if "sums" in skip:
                acc = acc + jnp.sum(vals.astype(jnp.bfloat16)
                                    .astype(jnp.float32)) \
                    + jnp.sum(oh_k.astype(jnp.float32)[:, :16] * 0)
            else:
                acc = acc + jax.lax.dot_general(
                    oh_k, vals.astype(jnp.bfloat16),
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)

    @pl.when(step == 0)
    def _():
        out_ref[0] = acc

    @pl.when(step > 0)
    def _():
        out_ref[0] += acc


def run_probe(rgb, luts, c, q, cfg, skip):
    b, _, hh, ww = rgb.shape
    wc = _lane_chunk(ww)
    fn = jax.jit(lambda r, l: pl.pallas_call(
        functools.partial(_probe_kernel, num_cells=c, q_pad=q, cfg=cfg,
                          wc=wc, skip=skip),
        grid=(b, hh // _ROWS),
        in_specs=[
            pl.BlockSpec((1, 3, _ROWS, ww), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lut_sections(c) * q, c),
                         lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, 16), lambda bb, i: (bb, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, 16), jnp.float32),
    )(r, l.astype(jnp.bfloat16)))
    np.asarray(fn(rgb, luts))  # compile+warm
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        np.asarray(fn(rgb, luts))
        ts.append(time.perf_counter() - t0)
    return min(ts)


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

    mp = b * h * w / 1e6
    base = run_probe(rgb, luts, c, q, cfg, frozenset())
    print(f"full probe kernel: {base*1e3:7.1f} ms ({mp/base:.0f} MP/s)")
    for skip in ("ohc", "gather", "dist", "ohk", "vals", "sums"):
        t = run_probe(rgb, luts, c, q, cfg, frozenset((skip,)))
        print(f"  -{skip:<7} {t*1e3:7.1f} ms   delta {1e3*(base-t):+7.1f} ms")


if __name__ == "__main__":
    main()
