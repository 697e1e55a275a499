"""Process-wide JAX configuration: persistent compilation cache.

Compilation on single-core hosts is expensive; the on-disk cache makes every
re-run (tests, CLI scripts, benchmarks) reuse compiled executables.

CPU-backend processes get their own cache namespace (``<dir>-cpu``): the
shared dir can hold XLA:CPU executables AOT-compiled by the remote TPU
compile helper with different host machine features, and loading those can
SIGILL the process. Gating on the *resolved* backend (not just the
JAX_PLATFORM_NAME env var) also covers processes that fall back to CPU
because no TPU is attached or that force CPU via the config API.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "VDT_JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), "../../.jax_cache")
)


def _resolved_backend():
    if os.environ.get("JAX_PLATFORM_NAME", "").lower() == "cpu":
        return "cpu"
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover - backend init failure
        return "cpu"


try:
    cache_dir = os.path.abspath(_CACHE_DIR)
    if _resolved_backend() == "cpu":
        cache_dir += "-cpu"  # never share entries with TPU-process helpers
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
except Exception:  # pragma: no cover - older jax versions
    pass

# Opt-in PRNG implementation override (VDT_PRNG=rbg|unsafe_rbg|threefry2x32).
# The default threefry bit generator is counter-based crypto math that costs
# real VPU time per sampled tensor inside the reverse-process scan; 'rbg'
# generates on a hardware-friendly path and is the standard TPU speed knob.
# Same distribution, DIFFERENT stream — fixed-seed outputs change, so this
# is never flipped silently: default stays threefry (all parity/golden tests
# assume it), benches A/B it explicitly.
_prng = os.environ.get("VDT_PRNG", "")
if _prng:
    try:
        jax.config.update("jax_default_prng_impl", _prng)
    except Exception:  # pragma: no cover - unknown impl name
        pass
