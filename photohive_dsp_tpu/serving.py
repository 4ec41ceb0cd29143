"""AOT serving artifacts: serialized, version-pinned report executables.

The reference ships a shared library whose ABI pins its behavior
(photohive_dsp's compiled .so, loaded via ctypes in lib.py); the
TPU-native analogue of a deployable compute artifact is a serialized
``jax.export`` module — the full batched report program captured as
StableHLO, with the shape/config-static tables embedded as constants.
A serving process can then run the exact bytes that were validated,
independent of the Python code drifting underneath it, and the artifact
survives jax minor-version upgrades under StableHLO's compatibility
guarantees.

Workflow:
    blob = export_report(1080, 1920, cfg, batch_size=16)   # bytes
    Path("report_1080p.jaxexport").write_bytes(blob)
    ...
    fn = load_report(blob)          # (u8 BHW3, boxes, valid) -> ReportData
    data = fn(u8_batch, boxes, valid)

The exported calling convention is the uint8 serving entry (the same
one models/batch uses): device-resident (B, H, W, 3) uint8 plus the
(B, 10, 4)/(B, 10) crop-box tensors.  Tables are embedded, so the
artifact is self-contained.

Determinism contract: a given artifact always produces identical
outputs for identical inputs.  Between an artifact and the *live* jit
(or between artifacts exported under different jax/XLA versions),
fusion/FMA-contraction differences can round f32 at the last ulp,
which may hop pixels sitting exactly on an HSV quantization-cell
boundary and swap near-tied saliency pairs — the validated artifact,
not the live code, is the serving source of truth
(tests/test_serving.py pins the drift bound).
"""

from __future__ import annotations

from typing import Callable, Union

import jax
import jax.numpy as jnp

from .config import MAX_CROP_BOXES, ReportConfig
from .models.pipeline import ReportData, ReportTables, full_report_batched

_REGISTERED = False


def _register_serialization() -> None:
    """ReportData is a NamedTuple; jax.export needs its pytree
    registered once per process to serialize the output tree."""
    global _REGISTERED
    if _REGISTERED:
        return
    try:
        jax.export.register_namedtuple_serialization(
            ReportData, serialized_name="photohive_dsp_tpu.ReportData")
    except ValueError:
        pass  # already registered (e.g. by a parallel import path)
    _REGISTERED = True


def export_report(height: int, width: int,
                  cfg: ReportConfig | None = None, *,
                  batch_size: Union[int, str] = 16,
                  use_pallas: bool | None = None,
                  mesh=None) -> bytes:
    """Serialize the batched uint8 report program for one (H, W, config).

    ``batch_size`` may be an int (artifact pinned to that exact batch)
    or the string ``"dynamic"`` — a symbolic batch dimension
    (jax.export shape polymorphism): ONE artifact then serves any batch
    size, recompiling per concrete size at load site like a normal jit.
    ``use_pallas`` defaults to the current backend's fast-path choice
    (models/batch._want_pallas); pass False to export the pure-XLA
    program (portable across platforms, the PHOTOHIVE_NO_PALLAS
    semantics).

    ``mesh`` (a jax.sharding.Mesh) exports the DATA-PARALLEL program
    with its shardings baked in: the artifact then requires the SAME
    device count at load time, ``batch_size`` must divide the device
    count, and inputs must be device_put with the batch axis sharded
    (load_report(mesh=...) handles that).  Collective-free by
    construction (the data axis needs none), so the artifact scales
    per-chip throughput with the mesh.  Dynamic batch is not supported
    with a mesh (per-shard shapes must be static).

    Returns the serialized artifact bytes.
    """
    from .models.batch import _want_pallas

    cfg = cfg or ReportConfig()
    cfg.validate()
    if use_pallas is None:
        use_pallas = _want_pallas()
    _register_serialization()

    if mesh is not None:
        if batch_size == "dynamic":
            raise ValueError("dynamic batch is not supported with a mesh "
                             "(per-shard shapes must be static)")
        from .parallel.sharding import (data_parallel_report_u8,
                                        flat_data_mesh)
        fmesh = flat_data_mesh(mesh)
        b = int(batch_size)
        if b % fmesh.size:
            raise ValueError(f"batch_size {b} must divide the mesh's "
                             f"{fmesh.size} devices")
        dp_fn, tables = data_parallel_report_u8(height, width, cfg, fmesh,
                                                use_pallas)
        fn = jax.jit(lambda u8, bx, vl: dp_fn(u8, bx, vl, tables))
    else:
        tables = ReportTables.build(height, width, cfg)

        @jax.jit
        def fn(u8, boxes, valid):
            from .ops.colorspace import u8_to_unit_f32
            u8p = jnp.moveaxis(u8, -1, 1)
            rgb = u8_to_unit_f32(u8p)
            return full_report_batched(rgb, boxes, valid, tables, cfg,
                                       use_pallas, rgb_u8=u8p)

        if batch_size == "dynamic":
            b, = jax.export.symbolic_shape("b")
        else:
            b = int(batch_size)
    args = (jax.ShapeDtypeStruct((b, height, width, 3), jnp.uint8),
            jax.ShapeDtypeStruct((b, MAX_CROP_BOXES, 4), jnp.int32),
            jax.ShapeDtypeStruct((b, MAX_CROP_BOXES), jnp.bool_))
    exported = jax.export.export(fn)(*args)
    return exported.serialize()


def load_report(blob: Union[bytes, bytearray], *, mesh=None) -> Callable:
    """Rehydrate an export_report artifact into a callable.

    The callable takes (u8 (B,H,W,3), boxes (B,10,4) int32,
    valid (B,10) bool) with the exported batch/shape and returns a
    ReportData (leading batch dim).  For a mesh-exported artifact, pass
    a mesh of the SAME device count: inputs are device_put batch-sharded
    over it before the call (the jax.export calling convention for
    multi-device modules)."""
    _register_serialization()
    exported = jax.export.deserialize(bytes(blob))
    call = jax.jit(exported.call)
    if mesh is None:
        return call
    from jax.sharding import NamedSharding, PartitionSpec
    from .parallel.mesh import DATA_AXIS
    from .parallel.sharding import flat_data_mesh
    sh = NamedSharding(flat_data_mesh(mesh), PartitionSpec(DATA_AXIS))

    def sharded_call(u8, boxes, valid):
        return call(jax.device_put(u8, sh), jax.device_put(boxes, sh),
                    jax.device_put(valid, sh))

    return sharded_call
