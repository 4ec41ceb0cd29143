"""Pallas 2-D real-FFT magnitude kernels (the SPEED.md "winning design").

reference: src/fft_processing.c:18-63 (pgm_fft): FFTW real-to-complex 2-D
transform, |X|^2 over the half spectrum of width W//2+1.  This module
computes the same |rfft2|^2 values as ops/fft.magnitude_fft, in a
*scrambled but statically known* layout, using two Pallas kernels instead
of XLA's FFT lowering.  Why: XLA lowers rfft2 at 1080p to ~4.2 GB of HBM
traffic per 16-image batch (tools/fft_probe.py census) against a ~0.6 GB
ideal — the stage is pure relayout overhead, not flops.

Decomposition (all sizes static per image shape):

  * Rows (length W = 128*Q): n = Q*p + q.  A radix-2 DIF FFT across the
    128 *lanes* (index p; 7 stages of pltpu.roll + select, twiddles from a
    precomputed (7, 128) table), a per-(q, lane) twiddle W_W^{q*r}, then a
    *pruned* direct DFT over the Q groups computing only the S =
    W//256 + 1 output groups that cover the half spectrum k <= W//2
    (coefficients are Python-float constants).  The lane FFT leaves its
    outputs bit-reversed across lanes; the twiddle tables are baked in
    physical lane order and the scramble is absorbed by the polar tables
    (below) — nothing ever unscrambles data on device.
  * Columns (length H = 8*M): n = 8*m + e.  An unrolled mixed-radix
    ({2,3,5}) complex FFT over the *tile* index m — each element is one
    (8, 128) f32 vreg pair, twiddles are Python complex scalars, and the
    decimation "gathers" are Python list indexing at trace time, so the
    output comes back in natural order for free.  Then the W_H^{e*u}
    twiddle from a precomputed (H, 128) table, and a 3-stage radix-2 DIF
    ladder across the 8 *sublanes* (pltpu.roll axis=0), whose bit-reversal
    is again left in the data.

The final magnitude layout maps physical (strip s, row r', lane l) to true
spectrum coordinates

    col = 128*s + bitrev7(l),   row = M*bitrev3(r' % 8) + r' // 8

and ``scrambled_polar_tables`` permutes the flat polar bin ids accordingly
(lanes whose true col > W//2 get the drop sentinel).  The log-normalize
max is permutation-invariant (the extra cols 961..1023 duplicate mirrored
kept entries of the real-input spectrum, so the max is unchanged), and the
report only ever consumes the spectrum through the bin means — so the
scramble never needs undoing.

Accuracy: all arithmetic is f32 (the same class as XLA's FFT); the
interpret-mode test pins >90 dB SNR against numpy's float64 rfft2, far
above the pipeline's 40 dB golden bar.  Rollback: PHOTOHIVE_FFT_PALLAS=0.
"""

from __future__ import annotations

import functools
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUB = 8


# ---------------------------------------------------------------------------
# planning (host, numpy)
# ---------------------------------------------------------------------------

def _bitrev(i: int, bits: int) -> int:
    out = 0
    for _ in range(bits):
        out = (out << 1) | (i & 1)
        i >>= 1
    return out


_RADIX_PRIMES = (2, 3, 5, 7, 11, 13)


def _factor_235(n: int):
    """Ascending small-prime factor list, or None if other primes remain.

    Historically {2,3,5}; extended to 7/11/13 (round 5) — _fft_rec's
    recursive combine is radix-generic (a direct r-point DFT at each
    level), so any small prime works; larger primes only cost r^2 cmuls
    per group, which stays cheap for r <= 13."""
    fs = []
    for p in _RADIX_PRIMES:
        while n % p == 0:
            fs.append(p)
            n //= p
    return fs if n == 1 else None


# Row-group cap: above _Q_DIRECT_MAX groups the pruned direct DFT's
# S x Q unrolled combine (and its VMEM accumulators) outgrows the
# compile/VMEM budget, so Q must be smooth and the kernel runs a full
# group FFT (_fft_rec) instead, keeping the first S outputs.  The upper
# cap bounds the (1, Q, 8, 128) input block + (Q, 2, 8, 128) twiddle
# table in VMEM (~12 KB/group).  8K (Q=60, M=540) is in range.
_Q_DIRECT_MAX = 32
_Q_MAX = 64

# Heights above this use the factored column-twiddle tables (see
# FftPlan.twcol).  2560 keeps every silicon-validated shape (<=4K) on
# the direct table; only 8K-class strips pay the extra per-tile complex
# multiply.  Tests lower it to cover the factored path at small shapes.
_COL_FACTOR_H = 2560


def eligible(height: int, width: int) -> bool:
    if width % _LANES or height % _SUB:
        return False
    q = width // _LANES
    if not (1 <= q <= _Q_MAX):
        return False
    if q > _Q_DIRECT_MAX and _factor_235(q) is None:
        return False
    m = height // _SUB
    return _factor_235(m) is not None


def use_pallas_fft(height: int, width: int) -> bool:
    """Routing: eligible AND expected to win.  8K-class strips (H >
    _COL_FACTOR_H) are kernel-correct (silicon parity 133 dB,
    tools/tpu_parity_check) but measured SLOWER than XLA's rfft2 there
    (16.9 vs 12.6 ms/image pipelined at 4320x7680, round 5): the M=540
    unrolled tile FFT schedules poorly.  PHOTOHIVE_FFT_PALLAS_TALL=1
    overrides for re-measurement."""
    if os.environ.get("PHOTOHIVE_FFT_PALLAS", "1") != "1":
        return False
    if not eligible(height, width):
        return False
    if height > _COL_FACTOR_H and \
            os.environ.get("PHOTOHIVE_FFT_PALLAS_TALL", "0") != "1":
        return False
    return True


def _dif_ladder_twiddles(n: int):
    """Stage twiddle tables for a radix-2 DIF ladder over n lanes/sublanes.

    Stage s works on blocks of L = n >> s: top half passes through as
    u + v, bottom half becomes (u - v) * W_L^j with j the position within
    the half-block.  Table rows are in *physical* position order; the top
    positions hold 1 (selected away).  Natural input -> bit-reversed
    output (asserted below)."""
    stages = int(math.log2(n))
    tw = np.ones((stages, n), np.complex128)
    for s in range(stages):
        lsz = n >> s
        half = lsz // 2
        for pos in range(n):
            j = pos % lsz
            if j >= half:
                tw[s, pos] = np.exp(-2j * np.pi * (j - half) / lsz)
    return tw


def _ladder_numpy(x: np.ndarray, tw: np.ndarray) -> np.ndarray:
    """Numpy mirror of the in-kernel roll ladder (x: (..., n) complex)."""
    n = x.shape[-1]
    for s in range(tw.shape[0]):
        half = (n >> s) // 2
        pos = np.arange(n)
        top = (pos & half) == 0
        partner = np.where(top, np.roll(x, n - half, axis=-1),
                           np.roll(x, half, axis=-1))
        x = np.where(top, x + partner, (partner - x) * tw[s])
    return x


def _check_ladder(n: int, tw: np.ndarray):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    got = _ladder_numpy(x, tw)
    want = np.fft.fft(x)
    bits = int(math.log2(n))
    perm = np.array([_bitrev(i, bits) for i in range(n)])
    np.testing.assert_allclose(got, want[perm], rtol=1e-9, atol=1e-9)


def _fft_rec(xs, cmul, cadd):
    """Recursive mixed-radix DIT over a Python list; natural in AND out.

    ``xs`` are opaque complex values combined only through the callbacks,
    so the same code plans numpy scalars (planner check) and traced (8,128)
    vreg pairs (kernel).  Twiddles are Python complex constants."""
    n = len(xs)
    if n == 1:
        return xs
    fs = _factor_235(n)
    r = fs[-1]                       # largest factor first at this level
    m = n // r
    subs = [_fft_rec(xs[j::r], cmul, cadd) for j in range(r)]
    out = [None] * n
    for k in range(n):
        acc = None
        for j in range(r):
            term = cmul(subs[j][k % m],
                        np.exp(-2j * np.pi * ((j * k) % n) / n))
            acc = term if acc is None else cadd(acc, term)
        out[k] = acc
    return out


def _check_fft_rec(n: int):
    rng = np.random.default_rng(3)
    x = list(rng.standard_normal(n) + 1j * rng.standard_normal(n))
    got = _fft_rec(x, lambda a, c: a * c, lambda a, b: a + b)
    np.testing.assert_allclose(np.array(got), np.fft.fft(np.array(x)),
                               rtol=1e-9, atol=1e-8)


class FftPlan(NamedTuple):
    """Device-resident twiddle tables + static geometry for one (H, W)."""

    height: int
    width: int
    q: int           # W // 128 row groups
    s: int           # kept output groups (strips) = W//256 + 1
    m: int           # H // 8 column tiles
    # Twiddle tables lead with the statically-indexed dim so every
    # in-kernel slice is a leading-dim index of an (8, 128)-tiled value
    # (misaligned sublane slices are rejected by Mosaic).  All tables are
    # host numpy (see for_shape) and become per-trace constants.
    twl: np.ndarray       # (7, 2, 8, 128) f32 lane-ladder twiddles (re, im)
    twrow: np.ndarray     # (Q, 2, 8, 128) f32 W_W^{q*bitrev(lane)}
    twcol: np.ndarray     # (2, H, 128) f32 W_H^{e*u} at rows 8u+e; for
    #                       large H (col_factored) instead (2, Hc, 128)
    #                       holding W_M^{e*u1} at rows 8*u1+e — the
    #                       direct (2, H, 128) table is 4 MB+ at 8K and
    #                       alone blew the col kernel's VMEM budget
    tws: np.ndarray       # (2, 3, 8, 128) f32 sublane-ladder twiddles
    dftq: tuple           # ((S, Q) re, (S, Q) im) python-float tuples
    # W_H^{e*u0} factor table (2, 64, 128) when col_factored, else None
    twcol_b: np.ndarray = None
    col_factored: bool = False

    @classmethod
    @functools.lru_cache(maxsize=8)
    def for_shape(cls, height: int, width: int) -> "FftPlan":
        assert eligible(height, width), (height, width)
        q = width // _LANES
        s = width // 256 + 1
        m = height // _SUB

        twl = _dif_ladder_twiddles(_LANES)
        _check_ladder(_LANES, twl)
        tw8 = _dif_ladder_twiddles(_SUB)
        _check_ladder(_SUB, tw8)
        _check_fft_rec(m)
        if q > _Q_DIRECT_MAX:
            _check_fft_rec(q)  # the group FFT replaces the direct DFT

        brl = np.array([_bitrev(i, 7) for i in range(_LANES)])
        twrow = np.exp(-2j * np.pi
                       * np.outer(np.arange(q), brl) / width)
        # Column twiddle W_H^{e*u}: direct (H, 128) table for normal
        # heights; factored W_M^{e*u1} * W_H^{e*u0} (u = 8*u1 + u0) for
        # tall strips — the direct table is 8*H KB and alone blew the 8K
        # col kernel's 16 MB scoped-VMEM budget (the factor tables total
        # ~0.6 MB; one extra complex multiply per tile).
        col_factored = height > _COL_FACTOR_H
        if col_factored:
            m1 = -(-m // _SUB)                      # u1 range
            uu1 = np.repeat(np.arange(m1), _SUB)    # u1 at row 8*u1+e
            ee1 = np.tile(np.arange(_SUB), m1)
            twcol = np.exp(-2j * np.pi * (ee1 * uu1) / m)[:, None]
            twcol = np.broadcast_to(twcol, (m1 * _SUB, _LANES))
            uu0 = np.repeat(np.arange(_SUB), _SUB)  # u0 at row 8*u0+e
            ee0 = np.tile(np.arange(_SUB), _SUB)
            twcol_b = np.exp(-2j * np.pi * (ee0 * uu0) / height)[:, None]
            twcol_b = np.broadcast_to(twcol_b, (_SUB * _SUB, _LANES))
        else:
            uu = np.repeat(np.arange(m), _SUB)      # u at row 8u+e
            ee = np.tile(np.arange(_SUB), m)        # e at row 8u+e
            twcol = np.exp(-2j * np.pi * (ee * uu) / height)[:, None]
            twcol = np.broadcast_to(twcol, (height, _LANES))
            twcol_b = None
        tws = np.broadcast_to(tw8[:, :, None], (3, _SUB, _LANES))

        dft = np.exp(-2j * np.pi
                     * np.outer(np.arange(s), np.arange(q)) / q)
        dftq = (tuple(tuple(float(v) for v in row) for row in dft.real),
                tuple(tuple(float(v) for v in row) for row in dft.imag))

        # Tables stay NUMPY in the (lru-cached) plan: converting to jax
        # arrays here would capture a tracer when the first for_shape call
        # happens inside a jit trace, then leak it into later traces.
        # They enter each trace as fresh constants at the pallas_call.
        def ri(a):
            """(X, 128) complex -> (X, 2, 8, 128) f32: re/im planes
            broadcast across 8 sublanes, stage/group index leading."""
            rr = np.stack([a.real, a.imag], axis=1)[:, :, None, :]
            rr = np.broadcast_to(rr, (a.shape[0], 2, _SUB, _LANES))
            return np.ascontiguousarray(rr).astype(np.float32)

        def ri2(a):
            return np.stack([a.real, a.imag]).astype(np.float32)

        return cls(height=height, width=width, q=q, s=s, m=m,
                   twl=ri(twl), twrow=ri(twrow), twcol=ri2(twcol),
                   tws=ri2(tws), dftq=dftq,
                   twcol_b=None if twcol_b is None else ri2(twcol_b),
                   col_factored=col_factored)


def scramble_maps(height: int, width: int):
    """(true_row, true_col) numpy index maps for the scrambled layout.

    true_col[c'] may exceed W//2 — those physical lanes hold mirrored
    duplicates and must be dropped by the consumer's tables."""
    m = height // _SUB
    s = width // 256 + 1
    rp = np.arange(height)
    true_row = m * np.array([_bitrev(int(e), 3) for e in rp % _SUB]) \
        + rp // _SUB
    cp = np.arange(s * _LANES)
    true_col = 128 * (cp // _LANES) \
        + np.array([_bitrev(int(l), 7) for l in cp % _LANES])
    return true_row, true_col


@functools.lru_cache(maxsize=32)
def _natural_polar_k(height: int, width: int, a_bins: int,
                     r_bins: int) -> int:
    """Natural-row-major local polar dictionary width for one geometry
    (the baseline the scrambled-K warning compares against)."""
    from .geometry import polar_chunk_tables, polar_geometry

    geom = polar_geometry(height, width, a_bins, r_bins)
    dict_nat, _ = polar_chunk_tables(
        np.asarray(geom.bin_ids).reshape(-1), a_bins * r_bins)
    return dict_nat.shape[1]


def scrambled_polar_tables(height: int, width: int, cfg):
    """PolarTables whose flat bin ids consume the scrambled magnitude
    (B, S, H, 128) layout directly — the permutation lives here, on the
    host, instead of in any device relayout."""
    from .blur import PolarTables
    from .geometry import polar_chunk_tables, polar_geometry

    geom = polar_geometry(height, width, cfg.angle_partitions,
                          cfg.radius_partitions)
    num_bins = cfg.angle_partitions * cfg.radius_partitions
    fftw = width // 2 + 1
    ids_true = geom.bin_ids.reshape(height, fftw)
    true_row, true_col = scramble_maps(height, width)
    keep = true_col <= width // 2
    ids_perm = np.full((height, true_col.shape[0]), num_bins, np.int32)
    ids_perm[:, keep] = ids_true[true_row][:, true_col[keep]]
    # physical layout is (S, H, 128): strips lead
    s = width // 256 + 1
    ids_strips = np.ascontiguousarray(
        ids_perm.reshape(height, s, _LANES).transpose(1, 0, 2)).reshape(-1)
    dict_ids, local_ids = polar_chunk_tables(ids_strips, num_bins)
    # The local kernel's cost scales with K (the per-chunk dictionary
    # width); polar_chunk_tables' ~64-bins-per-512-chunk premise assumes
    # row-major locality, which the scramble perturbs.  Make a blowup at a
    # new shape visible instead of a silent slowdown (ADVICE r4).  The
    # natural-order K is cached per geometry — recomputing it on every
    # (uncached) scrambled_polar_tables call doubled table-build time.
    k_scr = dict_ids.shape[1]
    k_nat = _natural_polar_k(height, width, cfg.angle_partitions,
                             cfg.radius_partitions)
    if k_scr > 2 * k_nat:
        import warnings
        warnings.warn(
            f"scrambled polar dictionary K={k_scr} vs natural K={k_nat} "
            f"at {height}x{width}: local polar kernel cost inflated "
            f"{k_scr / k_nat:.1f}x by the scramble", stacklevel=2)
    return PolarTables(pad_index=None,
                       bin_counts=jnp.asarray(geom.bin_counts),
                       bin_ids=jnp.asarray(ids_strips),
                       local_ids=jnp.asarray(local_ids),
                       dict_ids=jnp.asarray(dict_ids))


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------

def _lane_ladder(re, im, twl_ref):
    """7-stage radix-2 DIF over 128 lanes of an (8, 128) pair."""
    iota = jax.lax.broadcasted_iota(jnp.int32, re.shape, 1)
    for st in range(7):
        half = 64 >> st
        top = (iota & half) == 0
        pr_hi = pltpu.roll(re, 128 - half, axis=1)   # x[l+half]
        pi_hi = pltpu.roll(im, 128 - half, axis=1)
        pr_lo = pltpu.roll(re, half, axis=1)         # x[l-half]
        pi_lo = pltpu.roll(im, half, axis=1)
        pre = jnp.where(top, pr_hi, pr_lo)
        pim = jnp.where(top, pi_hi, pi_lo)
        sre = pre - re
        sim = pim - im
        tr = twl_ref[st, 0]                          # (8, 128)
        ti = twl_ref[st, 1]
        re = jnp.where(top, re + pre, sre * tr - sim * ti)
        im = jnp.where(top, im + pim, sre * ti + sim * tr)
    return re, im


def _sublane_ladder(re, im, tws):
    """3-stage radix-2 DIF over the 8 sublanes of an (8, 128) pair."""
    iota = jax.lax.broadcasted_iota(jnp.int32, re.shape, 0)
    for st in range(3):
        half = 4 >> st
        top = (iota & half) == 0
        pr_hi = pltpu.roll(re, 8 - half, axis=0)
        pi_hi = pltpu.roll(im, 8 - half, axis=0)
        pr_lo = pltpu.roll(re, half, axis=0)
        pi_lo = pltpu.roll(im, half, axis=0)
        pre = jnp.where(top, pr_hi, pr_lo)
        pim = jnp.where(top, pi_hi, pi_lo)
        sre = pre - re
        sim = pim - im
        tr = tws[0, st]
        ti = tws[1, st]
        re = jnp.where(top, re + pre, sre * tr - sim * ti)
        im = jnp.where(top, im + pim, sre * ti + sim * tr)
    return re, im


def _cmul_const(a, c):
    """(re, im) vreg pair times a Python complex constant, with exact
    shortcuts for the trivial twiddles (1, -1, +-i, pure re/im)."""
    ar, ai = a
    cr = float(c.real)
    ci = float(c.imag)
    if abs(cr - 1.0) < 1e-12 and abs(ci) < 1e-12:
        return ar, ai
    if abs(cr + 1.0) < 1e-12 and abs(ci) < 1e-12:
        return -ar, -ai
    if abs(cr) < 1e-12 and abs(ci + 1.0) < 1e-12:
        return ai, -ar
    if abs(cr) < 1e-12 and abs(ci - 1.0) < 1e-12:
        return -ai, ar
    if abs(ci) < 1e-12:
        return ar * cr, ai * cr
    if abs(cr) < 1e-12:
        return -ai * ci, ar * ci
    return ar * cr - ai * ci, ar * ci + ai * cr


def _cadd(a, b):
    return a[0] + b[0], a[1] + b[1]


def _row_fft_kernel(x_ref, twl_ref, twrow_ref, ore_ref, oim_ref, *,
                    q: int, s: int, dftq):
    """(Q, 8, 128) real rows -> (S, 8, 128) re/im kept half-spectrum.

    The group combine X[128t+r] = sum_q W_Q^{qt} ys_q[r] is a length-Q
    DFT over groups evaluated at t = 0..S-1.  For q <= _Q_DIRECT_MAX it
    runs as the pruned direct S x Q unroll (dftq coefficients); above
    that (8K: Q=60) the unroll outgrows compile/VMEM budgets, so a full
    mixed-radix group FFT (_fft_rec, natural order in and out) computes
    all Q outputs and the first S are kept — bit-identical layout."""
    ys = []
    for g in range(q):
        re = x_ref[0, g]                              # (8, 128)
        im = jnp.zeros_like(re)
        re, im = _lane_ladder(re, im, twl_ref)
        tr = twrow_ref[g, 0]                          # (8, 128)
        ti = twrow_ref[g, 1]
        ys.append((re * tr - im * ti, re * ti + im * tr))
    if q > _Q_DIRECT_MAX:
        out = _fft_rec(ys, _cmul_const, _cadd)
        for t in range(s):
            ore_ref[0, t] = out[t][0]
            oim_ref[0, t] = out[t][1]
        return
    dre, dim = dftq
    for t in range(s):
        are = None
        aim = None
        for g in range(q):
            yr, yi = ys[g]
            cr = dre[t][g]
            ci = dim[t][g]
            if abs(cr - 1.0) < 1e-12 and abs(ci) < 1e-12:
                tre, tim = yr, yi
            else:
                tre = yr * cr - yi * ci
                tim = yr * ci + yi * cr
            are = tre if are is None else are + tre
            aim = tim if aim is None else aim + tim
        ore_ref[0, t] = are
        oim_ref[0, t] = aim


def _col_fft_kernel(re_ref, im_ref, twcol_ref, tws_ref, mag_ref, *,
                    m: int, factored: bool, twb_ref=None):
    """(H, 128) re/im strip -> (H, 128) |X|^2, rows scrambled as
    documented in the module docstring.  ``factored``: the W_H^{e*u}
    twiddle is the product of the W_M^{e*u1} (twcol) and W_H^{e*u0}
    (twb) factor pages, u = 8*u1 + u0 — VMEM-cheap for tall strips."""
    tws = tws_ref[...]
    tiles = [(re_ref[0, 0, 8 * u:8 * u + 8], im_ref[0, 0, 8 * u:8 * u + 8])
             for u in range(m)]
    tiles = _fft_rec(tiles, _cmul_const, _cadd)

    for u in range(m):
        if factored:
            u1, u0 = u // _SUB, u % _SUB
            ar = twcol_ref[0, 8 * u1:8 * u1 + 8]
            ai = twcol_ref[1, 8 * u1:8 * u1 + 8]
            br = twb_ref[0, 8 * u0:8 * u0 + 8]
            bi = twb_ref[1, 8 * u0:8 * u0 + 8]
            tr = ar * br - ai * bi
            ti = ar * bi + ai * br
        else:
            tr = twcol_ref[0, 8 * u:8 * u + 8]
            ti = twcol_ref[1, 8 * u:8 * u + 8]
        gr, gi = tiles[u]
        re = gr * tr - gi * ti
        im = gr * ti + gi * tr
        re, im = _sublane_ladder(re, im, tws)
        mag_ref[0, 0, 8 * u:8 * u + 8] = re * re + im * im


def _col_fft_kernel_factored(re_ref, im_ref, twcol_ref, twb_ref, tws_ref,
                             mag_ref, *, m: int):
    """Positional-ref wrapper: pallas passes refs positionally, so the
    factored variant needs its own input arity."""
    _col_fft_kernel(re_ref, im_ref, twcol_ref, tws_ref, mag_ref, m=m,
                    factored=True, twb_ref=twb_ref)


def magnitude2_scrambled(pgm: jnp.ndarray, plan: FftPlan) -> jnp.ndarray:
    """(B, H, W) f32 -> (B, S, H, 128) f32 scrambled |rfft2|^2."""
    b, h, w = pgm.shape
    assert (h, w) == (plan.height, plan.width)
    q, s, m = plan.q, plan.s, plan.m
    # n = Q*p + q_idx: lanes hold p, groups hold q_idx
    xt = pgm.reshape(b, h, _LANES, q).transpose(0, 3, 1, 2)   # (B,Q,H,128)

    rre, rim = pl.pallas_call(
        functools.partial(_row_fft_kernel, q=q, s=s, dftq=plan.dftq),
        grid=(b, h // _SUB),
        in_specs=[
            pl.BlockSpec((1, q, _SUB, _LANES), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((7, 2, _SUB, _LANES), lambda bb, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((q, 2, _SUB, _LANES), lambda bb, i: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, s, _SUB, _LANES), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, _SUB, _LANES), lambda bb, i: (bb, 0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((b, s, h, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((b, s, h, _LANES), jnp.float32)),
    )(xt, jnp.asarray(plan.twl), jnp.asarray(plan.twrow))

    if plan.col_factored:
        kern = functools.partial(_col_fft_kernel_factored, m=m)
        hc = plan.twcol.shape[1]
        tw_specs = [
            pl.BlockSpec((2, hc, _LANES), lambda bb, ss: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, _SUB * _SUB, _LANES),
                         lambda bb, ss: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        tw_args = (jnp.asarray(plan.twcol), jnp.asarray(plan.twcol_b))
    else:
        kern = functools.partial(_col_fft_kernel, m=m, factored=False)
        tw_specs = [
            pl.BlockSpec((2, h, _LANES), lambda bb, ss: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        tw_args = (jnp.asarray(plan.twcol),)
    # Tall strips (8K: three double-buffered (4320, 128) f32 blocks plus
    # the tile-FFT's live temporaries) overflow Mosaic's default 16 MB
    # scoped-VMEM budget; raise it explicitly — v5e-class cores have
    # headroom above the conservative default.
    params = (pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)
              if plan.col_factored else None)
    mag = pl.pallas_call(
        kern,
        grid=(b, s),
        in_specs=[
            pl.BlockSpec((1, 1, h, _LANES), lambda bb, ss: (bb, ss, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, h, _LANES), lambda bb, ss: (bb, ss, 0, 0),
                         memory_space=pltpu.VMEM),
            *tw_specs,
            pl.BlockSpec((2, 3, _SUB, _LANES), lambda bb, ss: (0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, h, _LANES),
                               lambda bb, ss: (bb, ss, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, s, h, _LANES), jnp.float32),
        compiler_params=params,
    )(rre, rim, *tw_args, jnp.asarray(plan.tws))
    return mag


def magnitude_fft_scrambled_normalized(pgm_dc: jnp.ndarray,
                                       plan: FftPlan) -> jnp.ndarray:
    """(B, H, W) -> (B, S*H*128) log-normalized scrambled magnitude, the
    drop-in spectrum input for scrambled_polar_tables' bin ids.  The
    per-image max equals the true half-spectrum max (extra lanes duplicate
    mirrored kept entries), so G_s matches ops/fft.normalize_fft."""
    from .fft import normalize_fft

    b = pgm_dc.shape[0]
    mag2 = magnitude2_scrambled(pgm_dc, plan).reshape(b, -1)
    return jax.vmap(normalize_fft)(mag2)


def blur_bins_scrambled_lognorm(pgm_dc: jnp.ndarray, plan: FftPlan,
                                tables, num_angle_bins: int,
                                num_radius_bins: int) -> jnp.ndarray:
    """Fused FFT -> log-normalize -> polar bin means, never materializing
    the normalized spectrum: the local polar kernel applies the
    reference's ``x<1 -> 0 else log(x)`` gate in-kernel (log_gate) and the
    per-image G_s gain multiplies the bin sums outside (a scalar through a
    linear sum — reassociation only; bins are SNR-gated).  Saves one full
    spectrum write + read per batch vs normalize-then-bin.

    ``tables`` is the scrambled PolarTables (scrambled_polar_tables)."""
    from .pallas_kernels import polar_bin_sums_local

    b = pgm_dc.shape[0]
    mag2 = magnitude2_scrambled(pgm_dc, plan).reshape(b, -1)
    mx = jnp.max(mag2, axis=1)
    # Guard the zero-spectrum case (black/uniform frame after DC removal):
    # mx == 0 makes the gain inf and inf * 0-sums = NaN, where the
    # reference (src/fft_processing.c:192-199) and the unfused path both
    # yield all-zero bins (every value <1 is gated to 0).  Any finite gain
    # works since sums == 0 whenever mx < 1.
    denom = 2.0 * jnp.log(jnp.sqrt(mx) + 1.0)
    g_s = jnp.where(denom > 0.0, 1.0 / jnp.maximum(denom, 1e-30), 0.0)
    num_bins = num_angle_bins * num_radius_bins
    sums = polar_bin_sums_local(mag2, tables.local_ids, tables.dict_ids,
                                num_bins, log_gate=True)
    sums = sums * g_s[:, None]
    counts = tables.bin_counts.astype(jnp.float32)
    means = jnp.where(tables.bin_counts[None, :] > 0,
                      sums / jnp.maximum(counts, 1.0)[None, :], 0.0)
    return means.reshape(b, num_angle_bins, num_radius_bins)
