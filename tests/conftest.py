"""Test configuration: run JAX on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (SURVEY.md §4).

Note: the environment's sitecustomize imports jax at interpreter startup and
pins JAX_PLATFORMS=axon (tunneled TPU), so setting the env var here is too
late — we must update jax.config before any backend initializes.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

# The persistent compilation cache intermittently segfaults inside
# get_executable_and_time after ~150 suite tests (observed jax 0.9.0 on
# CPU; zstd deserialization of an entry written earlier in the same
# process). CPU compiles are cheap — run the suite without it. The TPU
# path (bench, CLI) keeps the cache (ma_tpu.enable_compilation_cache).
jax.config.update("jax_enable_compilation_cache", False)
