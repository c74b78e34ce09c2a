"""Persistent XLA compilation cache.

TPU compiles of the full pipeline take minutes (each jit unit is tens of
seconds on the remote-compile path); the persistent cache makes every run
after the first start in seconds. Called by bench.py, the CLIs, and the
driver entry points.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")

_enabled = False


def enable_compilation_cache(path: str | None = None):
    global _enabled
    if _enabled:
        return
    import jax

    # Honor JAX_PLATFORMS even when a sitecustomize hook force-set the
    # platform via jax.config after import (as the axon TPU plugin does):
    # without this, CLIs asked to run on CPU silently run on the TPU.
    env_platforms = os.environ.get("JAX_PLATFORMS")
    if env_platforms and jax.config.jax_platforms != env_platforms:
        jax.config.update("jax_platforms", env_platforms)

    path = path or os.environ.get("SOSL_JAX_CACHE", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    _enabled = True
