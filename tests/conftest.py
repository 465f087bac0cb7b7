"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding logic
(pjit over a Mesh, psum collectives) is exercised without TPU hardware — the
standard JAX pattern.

NOTE: this environment force-registers an `axon` TPU backend via
sitecustomize and sets JAX_PLATFORMS=axon, so the env var alone is not
enough — we must also override jax.config after import. Keeping tests off
the (single, tunneled, slow-to-compile) TPU chip is essential: it's reserved
for bench.py.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the fast tier's cost is dominated by CPU
# XLA compiles of the decoder-scan graphs (one per distinct
# shape/flag combination); caching them makes re-runs cheap
# (VERDICT r4 #6). Safe across -n workers (the cache is content-keyed
# and write-once per key).
jax.config.update("jax_compilation_cache_dir", "/tmp/tacotron2_test_jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
