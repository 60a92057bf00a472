"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip hardware is not available in CI; sharding tests use
``--xla_force_host_platform_device_count=8`` per SURVEY.md §4
("Multi-node testing without a cluster").

Note: the harness environment imports jax during ``sitecustomize`` with
``JAX_PLATFORMS=axon`` (remote TPU tunnel), so the env var is already baked
into jax's config defaults by the time this file runs — we must override via
``jax.config.update``, not ``os.environ``.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the pairing graphs take minutes to compile
# on CPU; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
