"""Per-axis FFT cost probe on the real chip.

Times (marginal, batch 16->32 slope, one sync per run, fresh-process
recommended) and cost-censuses each stage of the rfft2 magnitude path at
1080p, to decide where a Pallas/hybrid FFT attack should land:

  * rfft2 + |.|^2 (the production op, ops/fft.magnitude_fft)
  * rfft along W only (1920 = 2^7*3*5)
  * fft along H only (1080 = 2^3*3^3*5) of the complex half-spectrum
  * hybrid candidates: four-step variants are timed by fft_hybrid.py

Usage: JAX probes whatever platform is live; pass `cpu` argv[1] to force.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

H, W = 1080, 1920


def census(fn, *args):
    low = jax.jit(fn).lower(*args)
    comp = low.compile()
    ca = comp.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def timed(fn, args16, args32, iters=8):
    f = jax.jit(fn)
    o = f(*args16)
    jax.block_until_ready(o)
    o = f(*args32)
    jax.block_until_ready(o)

    def run(args, n):
        t0 = time.perf_counter()
        outs = [f(*args) for _ in range(n)]
        np.asarray(jax.tree_util.tree_leaves(outs[-1])[0][:1])
        return (time.perf_counter() - t0) / n

    t16 = run(args16, iters)
    t32 = run(args32, iters)
    return t16, t32, t32 - t16  # marginal = cost of 16 more images


def main():
    # generate ON DEVICE — a 265 MB host upload stalls for minutes when the
    # tunnel bandwidth sags (CLAUDE.md)
    kk = jax.random.PRNGKey(0)
    x16 = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (16, H, W), jnp.float32))(kk))
    x32 = jax.block_until_ready(
        jax.jit(lambda k: jax.random.normal(k, (32, H, W), jnp.float32))(kk))
    print("data on device", flush=True)

    def full(x):
        s = jnp.fft.rfft2(x)
        return jnp.square(jnp.real(s)) + jnp.square(jnp.imag(s))

    def row_only(x):
        return jnp.fft.rfft(x, axis=-1)

    def col_only_of(x):
        s = jnp.fft.rfft(x, axis=-1)
        return jax.lax.stop_gradient(s)

    # column fft on a precomputed complex half spectrum
    s16 = jnp.fft.rfft(x16, axis=-1)
    s32 = jnp.fft.rfft(x32, axis=-1)
    s16 = jax.block_until_ready(s16)
    s32 = jax.block_until_ready(s32)

    def col_fft(s):
        return jnp.fft.fft(s, axis=-2)

    def mag(s):
        return jnp.square(jnp.real(s)) + jnp.square(jnp.imag(s))

    cases = [
        ("rfft2+mag", full, (x16,), (x32,)),
        ("rfft_W", row_only, (x16,), (x32,)),
        ("fft_H(cpx)", col_fft, (s16,), (s32,)),
        ("mag_only", mag, (s16,), (s32,)),
    ]
    px = 16 * H * W / 1e6
    for name, fn, a16, a32 in cases:
        fl, by = census(fn, *a16)
        t16, t32, dm = timed(fn, a16, a32)
        print(
            f"{name:12s} b16 {t16*1e3:7.2f} ms  b32 {t32*1e3:7.2f} ms  "
            f"marginal {dm*1e3:7.2f} ms ({px/dm/1e0:6.0f} MP/s)  "
            f"census b16: {fl/1e9:7.2f} GFLOP {by/1e9:7.3f} GB"
        )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "cpu":
        jax.config.update("jax_platforms", "cpu")
    print("platform:", jax.devices()[0].platform, jax.devices()[0].device_kind)
    main()
