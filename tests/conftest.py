"""Test harness config: run everything on CPU with 8 virtual devices so
multi-chip sharding paths compile and execute without TPU hardware."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# Environment plugins (axon) may override jax_platforms at import time via
# jax.config.update — force CPU again after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# XLA CPU downgrades fp32 matmuls by default; tests compare against fp32
# NumPy oracles, so force full precision.
jax.config.update("jax_default_matmul_precision", "highest")
