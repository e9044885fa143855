"""Persistent-compilation-cache setup that survives early jax imports.

This environment's sitecustomize imports jax at interpreter start, so a
JAX_COMPILATION_CACHE_DIR exported only from Python (os.environ.setdefault in
a driver) never registers — jax.config.jax_compilation_cache_dir stays None
and every process pays full compiles through the tunneled backend.  Setting
the config attribute directly works at any time before the first compile.
"""

from __future__ import annotations

import os


def ensure_compilation_cache(path: str | None = None) -> str:
    """Point jax's persistent compilation cache at `path` (default:
    <repo>/.jax_cache) unless one is already configured.  Returns the
    effective directory."""
    import jax

    if jax.config.jax_compilation_cache_dir:
        return jax.config.jax_compilation_cache_dir
    if path is None:
        path = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", path)
    return path
