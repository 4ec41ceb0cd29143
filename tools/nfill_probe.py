"""On-chip MXU cost model probe for the palette GEMM shapes.

Establishes, on silicon, how Mosaic GEMM time scales with N (output
columns), M (one-hot rows), dtype (bf16 vs int8), and K-merge — the
facts the sums-GEMM N-fill attack (VERDICT r4 #1) depends on:

  * If t(N=16) == t(N=128) at fixed K, the MXU streams K regardless of
    lane fill and the only wins are int8 rate or fewer K-elements.
  * If t(N=128) ~= 8 x t(N=16), N is already "paid fairly" and the
    12.5%-fill framing is wrong.
  * int8 vs bf16 at the counts shape calibrates the 2x-rate assumption.

Each case is a standalone Pallas kernel that loads operands from VMEM
blocks and issues G back-to-back dot_generals per grid step (G sized so
the GEMM dominates scheduling overhead).  Operands are loaded once per
step; only the contraction differs across cases.

Run on the chip: python tools/nfill_probe.py
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

STEPS = 256         # grid length
G_LO, G_HI = 4, 36  # GEMMs per grid step: per-GEMM time = slope


def _gemm_kernel(a_ref, b_ref, o_ref, *, g: int, k: int, acc_shape):
    acc = jnp.zeros(acc_shape, jnp.float32 if a_ref.dtype != jnp.int8
                    else jnp.int32)
    b = b_ref[0]
    for i in range(g):
        # a DISTINCT lane-aligned a slice per GEMM — otherwise Mosaic
        # CSEs the g identical dots into one (first probe version did)
        a = a_ref[0, :, i * 128:i * 128 + k]
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=acc.dtype)
    o_ref[0] = acc


def _build(m, k, n, dtype, g):
    rng = np.random.default_rng(0)
    kb = k + G_HI * 128
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(0, 2, (1, m, kb)), jnp.int8)
        b = jnp.asarray(rng.integers(-3, 4, (1, n, k)), jnp.int8)
        acc_dt = jnp.int32
    else:
        a = jnp.asarray(rng.random((1, m, kb)), dtype)
        b = jnp.asarray(rng.random((1, n, k)), dtype)
        acc_dt = jnp.float32
    fn = jax.jit(lambda a, b: pl.pallas_call(
        functools.partial(_gemm_kernel, g=g, k=k, acc_shape=(m, n)),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((1, m, kb), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m, n), acc_dt),
    )(a, b))
    return fn, a, b


def _best(fn, a, b, reps=8):
    np.asarray(fn(a, b))  # compile+warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(a, b))
        best = min(best, time.perf_counter() - t0)
    return best


def time_case(name, m, k, n, dtype):
    """(m, k) x (n, k)^T contraction; per-GEMM time from the G-slope
    (dispatch RTT ~35 ms on this tunneled host swamps absolute times)."""
    try:
        fn_lo, a, b = _build(m, k, n, dtype, G_LO)
        fn_hi, _, _ = _build(m, k, n, dtype, G_HI)
        t_lo = _best(fn_lo, a, b)
        t_hi = _best(fn_hi, a, b)
    except Exception as exc:  # noqa: BLE001
        print(f"  {name:<28} FAILED {type(exc).__name__}: "
              f"{str(exc)[:100]}", flush=True)
        return None
    per_gemm = (t_hi - t_lo) / ((G_HI - G_LO) * STEPS)
    per_gemm_us = per_gemm * 1e6
    m_t = -(-m // 128)
    n_t = -(-n // 128)
    per_ktile_ns = per_gemm / (m_t * n_t * k) * 1e9
    print(f"  {name:<28} M={m:<4} K={k:<6} N={n:<4} {dtype.__name__:<9}"
          f" {per_gemm_us:8.2f} us/GEMM  {per_ktile_ns:7.4f} ns/K-elem"
          f"  ({2*m*k*n/per_gemm/1e12:6.1f} TFLOP-equiv)", flush=True)
    return per_gemm_us


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    k_sums = 15360
    # --- sums GEMM family: M=112 one-hot rows, vary N
    t16 = time_case("sums (prod shape)", 112, k_sums, 16, jnp.bfloat16)
    t32 = time_case("sums N=32", 112, k_sums, 32, jnp.bfloat16)
    t128 = time_case("sums N=128", 112, k_sums, 128, jnp.bfloat16)
    if t16 and t128:
        print(f"  -> N-scaling: t128/t16 = {t128/t16:.2f} "
              f"(1.0 => N free below 128; 8.0 => N paid linearly)",
              flush=True)
    # --- M scaling at the sums shape
    time_case("sums M=16 (transposed)", 16, k_sums, 112, jnp.bfloat16)
    time_case("sums M=128", 128, k_sums, 16, jnp.bfloat16)
    # --- int8 rate at the sums/counts shapes
    ti8 = time_case("sums int8", 112, k_sums, 16, jnp.int8)
    if ti8 and t16:
        print(f"  -> int8/bf16 at sums shape: {ti8/t16:.2f}", flush=True)
    time_case("counts int8 (prod shape)", 112, k_sums, 8, jnp.int8)
    # --- gather GEMM family: K=112, N=lane chunk
    tg = time_case("gather (prod shape)", 80, 112, 2048, jnp.bfloat16)
    time_case("gather K=128pad", 80, 128, 2048, jnp.bfloat16)
    time_case("gather M=128", 128, 112, 2048, jnp.bfloat16)
    time_case("gather N=1024", 80, 112, 1024, jnp.bfloat16)
    # --- K-merge: same total K in 8 smaller GEMMs vs one big one
    t1920 = time_case("sums K=1920 (per-chunk)", 112, 1920, 16,
                      jnp.bfloat16)
    if t1920 and t16:
        print(f"  -> merge benefit: 8*t(K=1920)/t(K=15360) = "
              f"{8*t1920/t16:.2f}", flush=True)


if __name__ == "__main__":
    main()
