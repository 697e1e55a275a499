"""Likelihood helpers (KL, discretized Gaussian decoder NLL) and masked means.

Semantics match /root/reference/improved_diffusion/losses.py and nn.py:73-77,
but are written as jnp pure functions so they trace into jitted loss/VLB code.
"""

import jax.numpy as jnp


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL divergence between two diagonal Gaussians (in nats).

    Shapes broadcast; scalars are allowed for any argument
    (reference losses.py:12-33).
    """
    mean1 = jnp.asarray(mean1)
    logvar1 = jnp.asarray(logvar1)
    mean2 = jnp.asarray(mean2)
    logvar2 = jnp.asarray(logvar2)
    return 0.5 * (
        -1.0
        + logvar2
        - logvar1
        + jnp.exp(logvar1 - logvar2)
        + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2)
    )


def approx_standard_normal_cdf(x):
    """Fast approximation of the standard normal CDF (reference losses.py:36)."""
    return 0.5 * (
        1.0 + jnp.tanh(jnp.sqrt(2.0 / jnp.pi) * (x + 0.044715 * jnp.power(x, 3)))
    )


def discretized_gaussian_log_likelihood(x, *, means, log_scales):
    """Log-likelihood of a Gaussian discretized to 8-bit bins.

    :param x: target images, rescaled to [-1, 1].
    (reference losses.py:43-70)
    """
    centered_x = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered_x + 1.0 / 255.0)
    cdf_plus = approx_standard_normal_cdf(plus_in)
    min_in = inv_stdv * (centered_x - 1.0 / 255.0)
    cdf_min = approx_standard_normal_cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    log_probs = jnp.where(
        x < -0.999,
        log_cdf_plus,
        jnp.where(
            x > 0.999,
            log_one_minus_cdf_min,
            jnp.log(jnp.clip(cdf_delta, min=1e-12)),
        ),
    )
    return log_probs


def mean_flat(tensor, mask=None):
    """Mean over all non-batch dims; if mask is given, the tensor is multiplied
    by the (broadcastable) mask first but the mean is still over all elements
    (NOT normalized by the mask sum) — this matches reference nn.py:73-77, and
    downstream code relies on it (e.g. rmse normalization in train_util).
    """
    if mask is not None:
        tensor = tensor * mask
    return tensor.mean(axis=tuple(range(1, tensor.ndim)))
