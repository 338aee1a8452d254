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
    enable_compilation_cache()
    return jax.default_backend()


def profiler_supported() -> tuple[bool, str]:
    """Whether jax.profiler tracing is usable on this runtime.

    The experimental 'axon' tunneled TPU runtime hangs inside
    ``jax.profiler.start_trace`` (measured on this host — CLAUDE.md), so
    CLIs must refuse to start a trace there instead of deadlocking.
    Returns (ok, reason-if-not).
    """
    try:
        version = getattr(jax.devices()[0].client, "platform_version", "")
    except Exception:
        return True, ""
    if "axon" in version:
        name = version.split(";")[0].replace("\n", " ").strip()
        return False, (
            f"jax.profiler hangs under the tunneled runtime ({name}); "
            "use --time_steps for per-step wall-clock instead")
    return True, ""


def enable_compilation_cache(path: str | None = None) -> None:
    """Persistent XLA compilation cache (measured here: a ~140s TPU compile
    replays in ~3s).  Default location is repo-local (gitignored); override
    with VISDIAL_JAX_CACHE, or set it to '0' to disable."""
    env = os.environ.get("VISDIAL_JAX_CACHE", "")
    if env == "0":
        return
    path = path or env or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), ".jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
