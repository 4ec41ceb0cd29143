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

STEPS = 32          # grid length
G = 8               # GEMMs per grid step


def _gemm_kernel(a_ref, b_ref, o_ref, *, g: int, acc_shape):
    acc = jnp.zeros(acc_shape, jnp.float32)
    a = a_ref[0]
    b = b_ref[0]
    for _ in range(g):
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc


def _gemm_kernel_i8(a_ref, b_ref, o_ref, *, g: int, acc_shape):
    acc = jnp.zeros(acc_shape, jnp.int32)
    a = a_ref[0]
    b = b_ref[0]
    for _ in range(g):
        acc = acc + jax.lax.dot_general(
            a, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
    o_ref[0] = acc


def time_case(name, m, k, n, dtype):
    """(m, k) x (n, k)^T contraction, G x STEPS times; ns per K-elem."""
    rng = np.random.default_rng(0)
    if dtype == jnp.int8:
        a = jnp.asarray(rng.integers(0, 2, (1, m, k)), jnp.int8)
        b = jnp.asarray(rng.integers(-3, 4, (1, n, k)), jnp.int8)
        kern, acc_dt = _gemm_kernel_i8, jnp.int32
    else:
        a = jnp.asarray(rng.random((1, m, k)), dtype)
        b = jnp.asarray(rng.random((1, n, k)), dtype)
        kern, acc_dt = _gemm_kernel, jnp.float32

    fn = jax.jit(lambda a, b: pl.pallas_call(
        functools.partial(kern, g=G, acc_shape=(m, n)),
        grid=(STEPS,),
        in_specs=[
            pl.BlockSpec((1, m, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, k), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m, n), lambda i: (0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m, n), acc_dt),
    )(a, b))
    np.asarray(fn(a, b))  # compile+warm
    ts = []
    for _ in range(6):
        t0 = time.perf_counter()
        np.asarray(fn(a, b))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    n_gemms = STEPS * G
    per_gemm_us = t / n_gemms * 1e6
    # normalized: ns per 128-deep K-slice per (M,N) 128x128 tile
    m_t = -(-m // 128)
    n_t = -(-n // 128)
    per_ktile_ns = t / n_gemms / (m_t * n_t * k) * 1e9
    print(f"  {name:<28} M={m:<4} K={k:<6} N={n:<4} {dtype.__name__:<9}"
          f" {per_gemm_us:8.1f} us/GEMM  {per_ktile_ns:7.4f} ns/K-elem"
          f"  ({2*m*k*n*n_gemms/t/1e12:6.1f} TFLOP-equiv)", flush=True)
    return per_gemm_us


def main():
    print(f"device: {jax.devices()[0].device_kind}", flush=True)
    k_sums = 15360
    # --- sums GEMM family: M=112 one-hot rows, vary N
    t16 = time_case("sums (prod shape)", 112, k_sums, 16, jnp.bfloat16)
    t32 = time_case("sums N=32", 112, k_sums, 32, jnp.bfloat16)
    t128 = time_case("sums N=128", 112, k_sums, 128, jnp.bfloat16)
    t256 = time_case("sums N=256", 112, k_sums, 256, jnp.bfloat16)
    print(f"  -> N-scaling: t128/t16 = {t128/t16:.2f} "
          f"(1.0 => N free below 128; 8.0 => N paid linearly)", flush=True)
    # --- M scaling at the sums shape
    time_case("sums M=16 (transposed)", 16, k_sums, 112, jnp.bfloat16)
    time_case("sums M=128", 128, k_sums, 16, jnp.bfloat16)
    # --- int8 rate at the sums/counts shapes
    ti8 = time_case("sums int8", 112, k_sums, 16, jnp.int8)
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
    print(f"  -> merge benefit: 8*t(K=1920)/t(K=15360) = "
          f"{8*t1920/t16:.2f}", flush=True)


if __name__ == "__main__":
    main()
