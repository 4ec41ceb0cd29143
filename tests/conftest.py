"""Test harness config: force a CPU backend with 8 virtual devices so the
sharded code paths (psum merges, halo exchange, distributed FFT) run in CI
without TPU hardware.

The environment's sitecustomize pins jax_platforms to the TPU plugin, so the
env var alone is not enough — override the config after import too.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
