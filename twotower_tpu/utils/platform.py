"""Backend-selection guard for CLI entry points.

Some managed TPU environments install a ``sitecustomize`` that re-selects
the TPU platform programmatically AFTER Python startup, silently overriding
``JAX_PLATFORMS=cpu`` from the caller's environment. Every CLI calls
``respect_env_platform()`` first so an explicit ``JAX_PLATFORMS=cpu`` (CI,
the 8-virtual-device CPU mesh, laptops) actually lands on CPU.
"""

from __future__ import annotations

import os


def _is_cpu_only(plats: str) -> bool:
    """True only for a bare ``cpu`` request. ``tpu,cpu`` is fallback
    ordering (prefer TPU) and must not be collapsed to CPU."""
    return [p.strip() for p in plats.lower().split(",")] == ["cpu"]


def respect_env_platform() -> None:
    """Re-assert the environment's ``JAX_PLATFORMS`` choice over any
    programmatic override. No-op when the env var is unset or the backend
    is already initialized (then the first-touch winner stands)."""
    if not _is_cpu_only(os.environ.get("JAX_PLATFORMS", "")):
        return
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized
