"""Host RNG state isolation (reference improved_diffusion/rng_util.py).

JAX device randomness is functional (explicit keys), so only host-side
numpy/python states need capturing — used so validation sampling doesn't
perturb the training input-pipeline streams.
"""

import random
from functools import wraps

import numpy as np


class RNG:
    """Context manager: seed numpy/python RNGs inside, restore states after."""

    def __init__(self, seed):
        self.seed = seed

    def __enter__(self):
        self.py_state = random.getstate()
        self.np_state = np.random.get_state()
        random.seed(self.seed)
        np.random.seed(self.seed)
        return self

    def __exit__(self, *args):
        random.setstate(self.py_state)
        np.random.set_state(self.np_state)


def rng_decorator(seed):
    def decorator(fn):
        @wraps(fn)
        def rng_fn(*args, **kwargs):
            with RNG(seed):
                return fn(*args, **kwargs)

        return rng_fn

    return decorator
