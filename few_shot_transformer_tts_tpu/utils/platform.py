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
    """Honor a ``JAX_PLATFORMS`` request through the config API, and enable
    the persistent compilation cache for every CLI.

    Call before any jax computation (importing jax is fine).

    The cache matters operationally on remote-compile TPU hosts: without it
    every train/eval/synthesize invocation pays 20-150 s of remote XLA
    compilation PER LATTICE SHAPE (measured: the first train step of a warm
    corpus run took ~80 s where a cached compile takes ~2 s).  bench.py set
    this from round 1; the CLIs did not (round-5 fix).  ``JAX_COMPILATION_
    CACHE_DIR`` overrides the default location.
    """
    import jax

    cache = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           os.path.expanduser("~/.cache/jax_compile"))
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
    except Exception:
        pass  # unwritable cache dir: run uncached rather than fail

    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        jax.config.update("jax_platforms", plat)
    except Exception:
        pass  # already initialized on the requested platform, or unknown name
