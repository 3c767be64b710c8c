"""Persistent XLA compilation cache.

First compiles of the big bucketed programs take minutes on this TPU
(compilation is relayed); the persistent cache makes them one-time per
machine.  Enabled by every CLI entry point; opt out with
FLAMED_JAX_CACHE=off.
"""

from __future__ import annotations

import os


def enable_persistent_cache(path: str | None = None) -> str | None:
    env = os.environ.get("FLAMED_JAX_CACHE")
    if env == "off":
        return None
    import jax

    path = path or env or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".jax_cache",
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return path
