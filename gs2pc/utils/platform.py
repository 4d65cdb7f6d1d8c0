"""Honour the JAX_PLATFORMS environment variable.

Some images pin a TPU PJRT plugin via ``jax.config`` from a
``sitecustomize`` module, which silently overrides the standard
``JAX_PLATFORMS`` env var.  Host-only entry points (format converters,
CPU test subprocesses) call :func:`honour_platform_env` before touching
jax so a ``JAX_PLATFORMS=cpu`` request actually lands — otherwise they
block on initialising a TPU backend they never use.
"""

from __future__ import annotations

import os


def honour_platform_env() -> None:
    """Re-apply ``JAX_PLATFORMS`` through ``jax.config``.

    Must run before the first jax computation (backend init is sticky).
    No-op when the variable is unset or jax is unavailable.
    """
    want = os.environ.get("JAX_PLATFORMS", "")
    if not want:
        return
    try:
        import jax

        jax.config.update("jax_platforms", want)
    except Exception:
        pass
