"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding logic
(pjit over a Mesh, psum collectives) is exercised without TPU hardware — the
standard JAX pattern. Must run before jax initializes its backends.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
