"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware. Must set flags before jax import."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
# Parity tests compare f32 vs torch f32; keep matmuls at highest precision.
os.environ.setdefault("JAX_DEFAULT_MATMUL_PRECISION", "highest")
