"""Test harness: run everything on an 8-device virtual CPU mesh.

The image's site hook imports the ``axon`` TPU-tunnel plugin, which
overrides ``jax_platforms`` to "axon,cpu" regardless of the JAX_PLATFORMS
environment variable — so tests must force CPU via ``jax.config.update``
(before any backend is initialized), not via the env var alone.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
