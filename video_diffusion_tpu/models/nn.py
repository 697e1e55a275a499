"""NN primitives: sinusoidal embeddings, zero-init helpers, EMA tree update.

TPU-first equivalents of /root/reference/improved_diffusion/nn.py. The fp16
master-param machinery (fp16_util.py) is intentionally absent: params live in
f32 and compute runs in bf16 via module dtype policy, which needs no loss
scaling on TPU.
"""

import math

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(timesteps, dim, max_period=10000):
    """Sinusoidal timestep embeddings; timesteps may be fractional.

    (reference nn.py:89-107)
    :param timesteps: 1-D array (N,).
    :return: (N, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    embedding = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        embedding = jnp.concatenate(
            [embedding, jnp.zeros_like(embedding[:, :1])], axis=-1
        )
    return embedding


def frame_embedding(frame_indices, dim, max_period):
    """Per-frame positional embeddings; max_period should be several times T.

    (reference nn.py:110-122)
    :param frame_indices: any-shape array of frame numbers.
    :return: frame_indices.shape + (dim,) float32.
    """
    orig_shape = frame_indices.shape
    return timestep_embedding(
        frame_indices.reshape(-1), dim=dim, max_period=max_period
    ).reshape(*orig_shape, dim)


def update_ema(ema_params, new_params, rate):
    """EMA tree update: ema = ema*rate + new*(1-rate) (reference nn.py:47-56)."""
    return jax.tree_util.tree_map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate), ema_params, new_params
    )


zero_init = nn.initializers.zeros_init()


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32 regardless of input dtype
    (reference nn.py:15-17, :80-86). Stats are over all non-batch axes within
    each channel group — for attention pre-norms this pools over the attended
    axis too, matching the reference's GroupNorm-on-(B*D, C, T) usage
    (unet.py:471-475)."""

    num_groups: int = 32

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        h = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return h.astype(orig_dtype)
