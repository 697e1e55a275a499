from . import jax_setup  # noqa: F401  (enables the persistent compilation cache)
