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

import subprocess

# The full suite in ONE process segfaulted reliably around test #120 (r2
# verdict item 4).  Root cause: every compiled/deserialized XLA:CPU
# executable contributes dozens of memory mappings that the in-process jit
# caches keep alive; the process crosses the kernel's default
# vm.max_map_count (65530 — observed 57k maps right before the crash) and
# dies with an unchecked-mmap SIGSEGV inside the AOT loader/cache path.
# Two-part fix: raise the limit where permitted (CI container runs as
# root; ignore failure elsewhere), and drop the jit caches between test
# modules so the peak stays bounded (the persistent on-disk cache makes
# re-loads cheap).
# Only raise the limit when it is actually below what the suite needs —
# never silently mutate kernel state that is already sufficient (ADVICE r3).
_NEED_MAP_COUNT = 1048576
try:
    with open("/proc/sys/vm/max_map_count") as _f:
        _cur = int(_f.read().strip())
except OSError:
    _cur = _NEED_MAP_COUNT
if _cur < _NEED_MAP_COUNT:
    _r = subprocess.run(
        ["sysctl", "-q", "-w", f"vm.max_map_count={_NEED_MAP_COUNT}"],
        check=False, capture_output=True)
    if _r.returncode == 0:
        print(f"[conftest] raised vm.max_map_count {_cur} -> {_NEED_MAP_COUNT}"
              " (XLA:CPU executable mappings; see comment above)")

import jax  # noqa: E402  (import after env mutation)

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite is dominated by re-jitting the same
# pipeline graphs in every file; cache them across files and runs.
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_executable_maps():
    """Release compiled executables after each test module (see the
    vm.max_map_count note above): keeps the suite's memory-mapping count
    bounded instead of monotonically accumulating every jitted program of
    every module."""
    yield
    jax.clear_caches()
