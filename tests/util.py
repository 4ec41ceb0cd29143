"""Shared test helpers."""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np


def run_isolated(code: str, artifact: str, timeout: float = 420,
                 retries: int = 3):
    """Run ``code`` in a CPU subprocess; success = ``artifact`` written
    and loadable (np.load).  Retries on failure.

    This is the deflake for interpret-mode shard_map on XLA:CPU: a run
    can SIGSEGV at interpreter exit or trip the 40 s collective
    rendezvous abort, but the computed results are correct whenever the
    artifact gets written (reproduced across revisions; see
    test_sharding.py) — so the child saves results to disk and the
    parent accepts the artifact even if the child then dies, retrying
    only when no artifact appeared."""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    last = None
    for _ in range(retries):
        if os.path.exists(artifact):
            os.unlink(artifact)
        last = subprocess.run([sys.executable, "-c", code], env=env,
                              capture_output=True, text=True,
                              timeout=timeout)
        if os.path.exists(artifact):
            try:
                return np.load(artifact)
            except Exception:  # noqa: BLE001 — torn write; retry
                continue
    raise AssertionError(
        f"isolated child failed {retries}x rc={last.returncode}:\n"
        f"{last.stderr[-2000:]}")


def snr_db(golden, ours) -> float:
    """Signal-to-noise ratio of ours vs the float64 golden, in dB."""
    golden = np.asarray(golden, np.float64)
    ours = np.asarray(ours, np.float64)
    err = np.linalg.norm(golden - ours)
    sig = np.linalg.norm(golden)
    if err == 0:
        return np.inf
    if sig == 0:
        return -np.inf
    return 20.0 * np.log10(sig / err)


def structured_image(height=480, width=640, seed=0):
    """A synthetic photo-like image: color blobs + gradient + mild noise.

    Designed so palette cells are well-populated and distinct (stable
    saliency ordering between f32 and f64 paths).
    """
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:height, 0:width].astype(np.float64)
    r = 0.25 + 0.5 * (x / width)
    g = 0.25 + 0.5 * (y / height)
    b = 0.35 + 0.25 * np.sin(2 * np.pi * x / 97) * np.cos(2 * np.pi * y / 61)
    # distinct saturated blobs
    for (cy, cx, rad, col) in [
        (height * 0.3, width * 0.3, 60, (0.9, 0.1, 0.1)),
        (height * 0.7, width * 0.6, 80, (0.1, 0.8, 0.2)),
        (height * 0.4, width * 0.8, 50, (0.15, 0.2, 0.9)),
        (height * 0.8, width * 0.2, 40, (0.95, 0.85, 0.1)),
    ]:
        mask = (y - cy) ** 2 + (x - cx) ** 2 < rad ** 2
        r[mask], g[mask], b[mask] = col
    rgb = np.stack([r, g, b])
    rgb += rng.normal(0, 0.01, rgb.shape)
    rgb = np.clip(rgb, 0.0, 1.0)
    # quantize to 8-bit levels like a real photo upload
    rgb = np.round(rgb * 255.0) / 255.0
    return rgb


def directional_blur_image(height=480, width=640, seed=1):
    """Anisotropic 1/f field: photo-like spectrum with a directional streak
    strong enough for the reference's vectorizer to report nonzero vectors."""
    rng = np.random.default_rng(seed)
    fy = np.fft.fftfreq(height)[:, None]
    fx = np.fft.rfftfreq(width)[None, :]
    rad = np.sqrt((4 * fy) ** 2 + fx ** 2) + 1e-9
    spec = np.fft.rfft2(rng.standard_normal((height, width))) / rad ** 1.5
    field = np.fft.irfft2(spec, s=(height, width))
    field = (field - field.min()) / (field.max() - field.min())
    return np.stack([field, field, field])
