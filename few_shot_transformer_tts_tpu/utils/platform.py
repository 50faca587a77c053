"""Backend-selection helper for the CLI entry points.

On this class of host the TPU plugin initializes regardless of the
``JAX_PLATFORMS`` environment variable (the env var is read before the plugin
registers and is then ignored).  The reliable request is the config API after
importing jax — ``jax.config.update("jax_platforms", ...)`` — which every CLI
applies via this helper so that ``JAX_PLATFORMS=cpu python synthesize.py ...``
behaves as documented (reference parity: the reference honors
``CUDA_VISIBLE_DEVICES=''`` for a CPU run).
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    """Honor a ``JAX_PLATFORMS`` request through the config API.

    Call before any jax computation (importing jax is fine).  No-op when the
    variable is unset.
    """
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # already initialized on the requested platform, or unknown name
