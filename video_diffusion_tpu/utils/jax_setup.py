"""Process-wide JAX configuration: persistent compilation cache.

Compilation on single-core hosts is expensive; the on-disk cache makes every
re-run (tests, CLI scripts, benchmarks) reuse compiled executables.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "VDT_JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), "../../.jax_cache")
)
try:
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - older jax versions
    pass
