"""Data-parallel batch execution: images sharded over the ``data`` mesh axis.

Each image's report is independent, so the batch axis partitions trivially —
XLA inserts no cross-image collectives; the win is pure throughput.  Mixed
resolutions are handled by the bucketing layer (models/batch.py), one
compiled executable per bucket shape.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import ReportConfig
from ..models.pipeline import ReportData, ReportTables, full_report
from .mesh import DATA_AXIS


def batched_report_fn(cfg: ReportConfig):
    """vmapped full_report: (B,3,H,W), (B,10,4), (B,10) -> batched ReportData."""
    fn = functools.partial(full_report, cfg=cfg)
    return jax.vmap(fn, in_axes=(0, 0, 0, None))


@functools.lru_cache(maxsize=16)
def data_parallel_report(height: int, width: int, cfg: ReportConfig,
                         mesh: Mesh):
    """Compiled batch-report step with the batch dim sharded over ``data``.

    Returns (fn, tables); fn(batch_rgb, boxes, valid, tables) -> ReportData
    with leading batch dimension.  Batch size must be a multiple of the
    data-axis size (pad at the caller; models/batch.py does).
    """
    tables = ReportTables.build(height, width, cfg)
    vfn = batched_report_fn(cfg)
    data_sharding = NamedSharding(mesh, P(DATA_AXIS))
    replicated = NamedSharding(mesh, P())
    fn = jax.jit(
        vfn,
        in_shardings=(data_sharding, data_sharding, data_sharding, replicated),
        out_shardings=data_sharding,
    )
    return fn, tables
