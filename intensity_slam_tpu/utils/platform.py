"""Platform selection helper for CLI tools.

Some deployment images register a remote-TPU JAX plugin through
sitecustomize and pin `JAX_PLATFORMS` at interpreter start, which silently
overrides a platform the USER set in the environment (e.g.
`JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8` for
the virtual CPU mesh).  Calling `honor_env_platform()` before any JAX use
re-applies the user's intent from the shell environment.
"""

from __future__ import annotations

import os


def honor_env_platform() -> None:
    want = os.environ.get("JAX_PLATFORMS", "")
    if not want:
        return
    import jax

    jax.config.update("jax_platforms", want)
