"""Persistent XLA compilation cache setup, in one place.

jax is pre-imported at interpreter startup in this environment, so
the ``JAX_COMPILATION_CACHE_DIR`` env var alone never reaches the
config — every entry point must set it through ``jax.config`` or pay
the full (minutes-long on the tunneled backend) remote recompile on
every run.

Callers skip this for CPU runs (cached AOT artifacts are
machine-feature-pinned and reload with SIGILL warnings); the helper
deliberately does NOT probe the backend itself, because doing so
would initialize it before a caller's ``jax_platforms`` override.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_cache(cache_dir: str | None = None,
                            min_compile_secs: float = 2.0) -> None:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      cache_dir or DEFAULT_DIR)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:               # knob absent in some jax versions
        pass
