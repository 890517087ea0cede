"""Persistent XLA compilation cache — first run compiles, later runs load."""

from __future__ import annotations

import os


def honor_platform_env() -> None:
    """Make JAX_PLATFORMS authoritative even when a site plugin pinned
    jax_platforms at interpreter start (this environment's TPU plugin does);
    must run before any backend initializes."""
    env = os.environ.get("JAX_PLATFORMS")
    if not env:
        return
    import jax

    try:
        jax.config.update("jax_platforms", env)
    except Exception:
        pass


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    import jax

    if cache_dir is None:
        root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(root, ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
