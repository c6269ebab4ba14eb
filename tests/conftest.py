"""Test harness config: run all tests on CPU with 8 virtual XLA devices so
multi-chip sharding (mesh/pjit/shard_map) is exercised without TPU hardware.

Note: the TPU plugin in this environment ignores the JAX_PLATFORMS env var,
so the platform is forced programmatically before any backend use."""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
# Persistent compile cache (same dir as bench.py): the editor jits alone cost
# minutes of CPU compile; cache hits make suite reruns measure the tests.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), ".jax_cache"),
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.environ["JAX_COMPILATION_CACHE_DIR"])
