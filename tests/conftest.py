"""Test configuration: run everything on a simulated 8-device CPU mesh.

Multi-chip shardings are validated without TPU hardware via
``xla_force_host_platform_device_count`` (SURVEY §4 implication note).
The axon TPU plugin (if present) overrides JAX_PLATFORMS at import time, so
the platform is forced back to CPU via jax.config before any backend use.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# Drop the axon TPU plugin's site dir before jax imports: even with
# jax_platforms=cpu the plugin initializes its tunnel at registration time
# (60-80 s, and it wedges if another process holds the tunnel). CPU-only
# tests must never touch it.
sys.path[:] = [p for p in sys.path if ".axon_site" not in p]
os.environ["PYTHONPATH"] = ":".join(
    p for p in os.environ.get("PYTHONPATH", "").split(":") if ".axon_site" not in p
)

import jax

jax.config.update("jax_platforms", "cpu")
# Full-precision fp32 matmuls for numerics tests (TPU/CPU defaults are relaxed).
jax.config.update("jax_default_matmul_precision", "highest")
