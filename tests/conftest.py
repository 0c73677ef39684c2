"""Test configuration: force CPU backend with 8 virtual devices.

Tests run on an 8-device virtual CPU mesh so multi-chip sharding paths
(`parallel/`) are exercised without TPU hardware. Set before jax import.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: ambient env may say axon/tpu
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# Env vars alone are not enough: a pytest plugin may import jax before this
# conftest runs, so pin the platform through the config API as well (works
# any time before first backend creation).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gs3d_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
