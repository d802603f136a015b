"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY §4 implication note).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# Full-precision fp32 matmuls for numerics tests (the CPU default is relaxed).
jax.config.update("jax_default_matmul_precision", "highest")
