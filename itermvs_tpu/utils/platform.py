"""Honor an explicit JAX_PLATFORMS environment variable.

Some TPU plugin launchers force the platform via `jax.config` during
interpreter startup (sitecustomize), which silently overrides a
JAX_PLATFORMS value the user set for this process (e.g. CPU test runs
of the CLIs). Re-assert the environment's choice before any backend is
used; no-op when the variable is unset or backends already match.
"""
from __future__ import annotations

import os


def respect_jax_platforms_env() -> None:
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    if getattr(jax.config, "jax_platforms", None) == env:
        return
    jax.config.update("jax_platforms", env)
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
