"""Persistent XLA compilation cache.

This container does NOT preconfigure `jax_compilation_cache_dir`, and TPU
compiles go through a slow remote tunnel (minutes per big program), so
every entry point opts in explicitly. Safe to call multiple times and
before/after backend initialization; programs already compiled in-process
are unaffected.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/jax_compilation")


def enable_persistent_cache(path: str | None = None) -> str:
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR", _DEFAULT)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        # Cache everything that takes meaningful time to build; the big
        # tracking/coupled programs take minutes.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without some knobs: cache dir alone still works
    return path
