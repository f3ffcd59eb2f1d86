"""Persistent XLA compilation cache shared by all entry points.

The scalar-SoA physics graphs take seconds (CPU) to minutes (TPU-over-
tunnel) to compile; the cache makes every repeat CLI invocation, bench run
and test session start warm.
"""

from pathlib import Path

import jax

_CACHE_DIR = Path(__file__).resolve().parents[2] / ".jax_cache"


def enable_compilation_cache():
    _CACHE_DIR.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
