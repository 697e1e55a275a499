"""Process-wide JAX configuration: persistent compilation cache.

Compilation on single-core hosts is expensive; the on-disk cache makes every
re-run (tests, CLI scripts, benchmarks) reuse compiled executables.

The cache is skipped for CPU-forced processes (JAX_PLATFORM_NAME=cpu): on
this image the cache can hold XLA:CPU executables AOT-compiled by the remote
TPU compile helper with different host machine features, and loading those
can SIGILL the process.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "VDT_JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), "../../.jax_cache")
)
if os.environ.get("JAX_PLATFORM_NAME", "").lower() != "cpu":
    try:
        jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - older jax versions
        pass
