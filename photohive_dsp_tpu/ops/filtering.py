"""Small FIR stencils.

* 3x3 Laplacian with zero-padded borders — reference src/filtering.c:40-50
  (kernel) and :81-107 (zero-padded correlation).  Implemented as shifted
  adds, which XLA fuses into a single VPU pass; no im2col / scatter.
* Trailing circular 1-D box smoother — reference src/filtering.c:12-24:
  result[i] = mean_{j=0..size-1} x[(i-j) mod n]  (a *trailing* window, not
  centered — faithfully reproduced).
"""

from __future__ import annotations

import jax.numpy as jnp


def laplacian_3x3(x: jnp.ndarray) -> jnp.ndarray:
    """response = 8*x - sum of 8 zero-padded neighbors.

    Matches filter_image(initialize_3x3_laplacian(), ...) semantics
    (reference src/filtering.c:40-50, :81-107): out-of-image taps contribute
    zero.
    """
    p = jnp.pad(x, 1)
    neighbors = (
        p[:-2, :-2] + p[:-2, 1:-1] + p[:-2, 2:]
        + p[1:-1, :-2] + p[1:-1, 2:]
        + p[2:, :-2] + p[2:, 1:-1] + p[2:, 2:]
    )
    return 8.0 * x - neighbors


def trailing_circular_box(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Circular trailing box mean (reference src/filtering.c:12-24)."""
    acc = x
    for j in range(1, size):
        acc = acc + jnp.roll(x, j)
    return acc / float(size)
