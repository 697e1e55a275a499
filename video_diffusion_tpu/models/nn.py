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


class _GNParams(nn.Module):
    """Scale/bias holder whose param names ('scale', 'bias') and shapes match
    flax.linen.GroupNorm, so checkpoints are interchangeable between the
    fused-Pallas and nn.GroupNorm execution paths."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param(
            "scale", nn.initializers.ones_init(), (self.features,), jnp.float32
        )
        bias = self.param("bias", zero_init, (self.features,), jnp.float32)
        return scale, bias


class GroupNorm32(nn.Module):
    """GroupNorm(32) computed in float32 regardless of input dtype
    (reference nn.py:15-17, :80-86). Stats are over all non-batch axes within
    each channel group — for attention pre-norms this pools over the attended
    axis too, matching the reference's GroupNorm-on-(B*D, C, T) usage
    (unet.py:471-475).

    ``act='silu'`` appends SiLU, and ``mod_scale``/``mod_bias`` apply a
    per-sample FiLM modulation h*(1+ms)+mb between the norm and the
    activation (the ResBlock scale-shift path). With ``use_pallas`` on a TPU
    backend the whole chain runs as one fused Pallas kernel
    (ops/pallas_kernels.py) — one HBM read + one write. Param tree is
    identical on both paths."""

    num_groups: int = 32
    act: str = ""  # '' or 'silu'
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x, mod_scale=None, mod_bias=None):
        orig_dtype = x.dtype
        if (
            self.use_pallas
            and self.act == "silu"
            and jax.default_backend() in ("tpu", "axon")
        ):
            from ..ops.pallas_kernels import group_norm_silu

            scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
            N, C = x.shape[0], x.shape[-1]
            ms = None if mod_scale is None else mod_scale.reshape(N, C)
            mb = None if mod_bias is None else mod_bias.reshape(N, C)
            return group_norm_silu(
                x, scale, bias, ms, mb, num_groups=self.num_groups
            )
        h = nn.GroupNorm(
            num_groups=self.num_groups, epsilon=1e-5, dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        h = h.astype(orig_dtype)
        if mod_scale is not None:
            h = h * (1 + mod_scale) + mod_bias
        if self.act == "silu":
            h = nn.silu(h)
        return h
