"""Persistent XLA compilation cache.

First compile of the full train step via the remote TPU tunnel takes
minutes; the persistent cache makes every later process start instantly.
Call early (before the first jit execution).
"""
import os

import jax

_DEFAULT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable(path: str | None = None) -> str:
    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
