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
# on CPU; cache them across test runs. The dir is keyed by the host's CPU
# feature set — XLA:CPU AOT artifacts produced under different machine
# features segfault (SIGILL) when loaded, and /tmp can carry entries from
# a different host generation.
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _flags = next(
            (ln for ln in _f if ln.startswith("flags")), ""
        )
except OSError:  # pragma: no cover
    _flags = ""
_cache_key = hashlib.md5(_flags.encode()).hexdigest()[:10]
jax.config.update(
    "jax_compilation_cache_dir", f"/tmp/jax_cache_cpu_{_cache_key}"
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
