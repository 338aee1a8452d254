"""Platform selection fix-up.

On some hosts a sitecustomize registers the TPU PJRT plugin at interpreter
startup and latches the platform before user code runs, which makes the
standard ``JAX_PLATFORMS`` env var silently ineffective.  CLIs call
``apply_platform_env()`` first thing so the env var behaves as documented
(e.g. ``JAX_PLATFORMS=cpu`` + ``--xla_force_host_platform_device_count=8``
for the virtual multi-chip mesh).
"""

from __future__ import annotations

import os

import jax


def apply_platform_env() -> str:
    """Re-apply JAX_PLATFORMS from the environment; return the platform."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want:
        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
    return jax.default_backend()
