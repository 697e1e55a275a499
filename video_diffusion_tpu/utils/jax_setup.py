"""Process-wide JAX configuration: persistent compilation cache.

Compilation on single-core hosts is expensive; the on-disk cache makes every
re-run (tests, CLI scripts, benchmarks) reuse compiled executables.

CPU-backend processes get their own cache namespace (``<dir>-cpu``): the
shared dir can hold XLA:CPU executables AOT-compiled by the remote TPU
compile helper with different host machine features, and loading those can
SIGILL the process.

The namespace decision deliberately NEVER calls ``jax.default_backend()``:
that would initialize the backend (and on a TPU host, grab the chip) as an
import side effect of every tool that merely imports the package. Instead
it consults the platform *request* — the ``JAX_PLATFORMS`` /
``JAX_PLATFORM_NAME`` env vars and any config-API value set before this
import. Consequence: a process that forces CPU via
``jax.config.update('jax_platform_name', 'cpu')`` AFTER importing the
package keeps the shared namespace; set the env var (as tests/conftest.py
does) or call the config API before import to get the ``-cpu`` namespace.
"""

import os

import jax

_CACHE_DIR = os.environ.get(
    "VDT_JAX_CACHE_DIR", os.path.join(os.path.dirname(__file__), "../../.jax_cache")
)


def _resolved_backend():
    """Best-effort platform request WITHOUT initializing the backend."""
    for v in (
        os.environ.get("JAX_PLATFORMS", ""),
        os.environ.get("JAX_PLATFORM_NAME", ""),
        str(getattr(jax.config, "jax_platforms", None) or ""),
        str(getattr(jax.config, "jax_platform_name", None) or ""),
    ):
        v = v.split(",")[0].strip().lower()
        if v:
            return v
    return "tpu"  # unset = the default TPU-host configuration


def _host_fingerprint():
    """Short hash of the host's CPU feature flags: XLA:CPU AOT executables
    are feature-specific, and this sandbox migrates between VMs with
    different ISAs between rounds — loading another host's cached CPU
    executable risks SIGILL (observed as cpu_aot_loader 'machine type
    doesn't match' errors)."""
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.md5(line.encode()).hexdigest()[:8]
    except OSError:
        pass
    import platform

    return hashlib.md5(platform.processor().encode()).hexdigest()[:8]


try:
    cache_dir = os.path.abspath(_CACHE_DIR)
    if _resolved_backend() == "cpu":
        # never share entries with TPU-process helpers OR other hosts
        cache_dir += "-cpu-" + _host_fingerprint()
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
