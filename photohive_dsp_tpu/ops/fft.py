"""2-D real FFT magnitude and log normalization.

reference: src/fft_processing.c
  * pgm_fft (:18-63): FFTW real-to-complex 2-D transform; stores
    |X|^2 = re^2 + im^2 over the half spectrum of width W//2+1.
  * pgm_normalize_fft (:173-213): global max, G_s = 1/(2*log(sqrt(max)+1)),
    then x < 1 -> 0 else log(x)*G_s (log-compressed to [0, 1]).

TPU-native path: XLA's native FFT op via jnp.fft.rfft2 (complex64).  The
input has its DC bias removed beforehand (reference src/blur_profile.c:233
subtracts the *RGB-brightness* mean, not the luma mean — see pipeline), which
keeps the spectrum's dynamic range well inside f32 after log compression.
"""

from __future__ import annotations

import jax.numpy as jnp


def magnitude_fft(pgm: jnp.ndarray) -> jnp.ndarray:
    """|rfft2(pgm)|^2, shape (H, W//2+1) float32."""
    spec = jnp.fft.rfft2(pgm)
    return jnp.square(jnp.real(spec)) + jnp.square(jnp.imag(spec))


def normalize_fft(mag_sq: jnp.ndarray) -> jnp.ndarray:
    """Log compression with the reference's G_s gain (src/fft_processing.c:192-199)."""
    mx = jnp.max(mag_sq)
    g_s = 1.0 / (2.0 * jnp.log(jnp.sqrt(mx) + 1.0))
    safe = jnp.where(mag_sq < 1.0, 1.0, mag_sq)
    return jnp.where(mag_sq < 1.0, 0.0, jnp.log(safe) * g_s)


def magnitude_fft_normalized(pgm_dc_removed: jnp.ndarray) -> jnp.ndarray:
    """compute_magnitude_fft equivalent (reference src/fft_processing.c:70-74)."""
    return normalize_fft(magnitude_fft(pgm_dc_removed))
