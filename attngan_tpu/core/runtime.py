"""Process-level runtime setup shared by the CLI entry points.

The reference has no equivalent (its scripts are notebook cells); here the
one thing every entry point wants is a persistent XLA compilation cache —
first compiles of the jitted train/sample programs cost minutes (more
through a remote-compile service), repeat runs should not pay twice.
"""

from __future__ import annotations

import os


def enable_persistent_compilation_cache(path: str | None = None) -> str:
    """Point jax at an on-disk compilation cache (keyed on HLO; safe across
    runs). Override location with ATTNGAN_JAX_CACHE; disable entirely with
    ATTNGAN_JAX_CACHE=0."""
    import jax

    path = path or os.environ.get(
        "ATTNGAN_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "attngan_jax"))
    if path == "0":
        return ""
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return path
