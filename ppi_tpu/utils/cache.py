"""Persistent XLA compilation cache shared by all entry points.

The scalar-SoA physics graphs take seconds (CPU) to minutes (TPU-over-
tunnel) to compile; the cache makes every repeat CLI invocation, bench run
and test session start warm.
"""

import os
from pathlib import Path

import jax

# PPI_TPU_CACHE_DIR overrides the shared default — concurrent processes
# (e.g. a CPU test run next to a device experiment) should point at
# separate dirs: a concurrent write to one cache dir has been observed to
# segfault XLA:CPU inside backend_compile_and_load (see
# .claude/skills/verify/SKILL.md).
_CACHE_DIR = Path(os.environ.get(
    "PPI_TPU_CACHE_DIR",
    Path(__file__).resolve().parents[2] / ".jax_cache"))


def enable_compilation_cache():
    _CACHE_DIR.mkdir(exist_ok=True, parents=True)
    jax.config.update("jax_compilation_cache_dir", str(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
