"""Test config: run everything on an 8-device virtual CPU mesh.

Mirrors SURVEY.md §4.4: multi-host code paths are exercised deterministically
in CI via `--xla_force_host_platform_device_count`; the same code runs on a
real TPU pod slice.

Note: the container's sitecustomize force-registers the remote `axon` TPU
platform (JAX_PLATFORMS=axon in the env), so a plain setdefault is not
enough — we must override the env var AND the already-loaded jax config.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402  (import after env mutation)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by re-jitting the same
# pipeline graphs in every file; cache them across files and runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
