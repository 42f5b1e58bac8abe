"""Test config: run JAX on a virtual 8-device CPU mesh so sharding paths are
exercised without TPU hardware.

The environment's sitecustomize imports jax at interpreter startup with
JAX_PLATFORMS=axon (remote TPU tunnel), freezing the config default before
this file runs — so we must update the jax config directly, not just env."""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# No persistent compile cache in tests: this VM migrates hosts, and CPU
# executables cached on another host load with different codegen (FMA
# availability differs -> 1-ulp drift), breaking the byte-exact parity
# tests. In-process compiles are fast on CPU and deterministic.
os.environ["CODEC_JAX_CACHE"] = "0"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Parity tests compare f32 vs torch f32; keep matmuls at highest precision.
jax.config.update("jax_default_matmul_precision", "highest")


def pytest_configure(config):
    assert jax.default_backend() == "cpu", f"tests must run on CPU, got {jax.default_backend()}"
    assert jax.device_count() == 8, f"expected 8 virtual CPU devices, got {jax.device_count()}"
