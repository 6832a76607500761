"""Test harness config.

Tests run on the CPU platform with 8 virtual devices so the multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4,
"multi-node without a cluster").

Note: this environment presets ``JAX_PLATFORMS=axon`` (the TPU tunnel) and
the plugin wins over env-var overrides, so the platform must be forced via
``jax.config`` — env vars alone are NOT enough here.
"""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# This host has a single CPU core; persist compiled executables so repeat
# test runs skip XLA compilation.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.3)
