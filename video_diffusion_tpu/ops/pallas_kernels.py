"""Pallas TPU kernels for the hot memory-bound ops.

The U-Net's FLOPs live in convs/matmuls that XLA already schedules onto the
MXU; what XLA fuses less aggressively is the GroupNorm chain (reduce ->
normalize -> scale/shift -> SiLU) that brackets every ResBlock and attention
block. ``group_norm_silu`` computes the whole chain in one VMEM-resident
kernel: one HBM read + one HBM write of the activation instead of several.

All kernels have jnp reference implementations and are parity-tested
(tests/test_pallas.py); ``use_pallas=False`` (or non-TPU backends) falls back
to the reference path automatically.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


def group_norm_silu_reference(x, scale, bias, num_groups=32, eps=1e-5):
    """Reference: GroupNorm over (spatial..., group-channels) in f32, then
    scale/shift, then SiLU; matches models.nn.GroupNorm32 + nn.silu."""
    orig_dtype = x.dtype
    N = x.shape[0]
    C = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(N, -1, num_groups, C // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (xn * jax.nn.sigmoid(xn)).astype(orig_dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps):
    # x block: (1, S, C) — all spatial positions of one sample in VMEM
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    S, C = x.shape
    G = num_groups
    xg = x.reshape(S, G, C // G)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean((xg - mean) ** 2, axis=(0, 2), keepdims=True)
    xn = (xg - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(S, C) * scale_ref[:] + bias_ref[:]
    o_ref[0] = (xn * jax.nn.sigmoid(xn)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "use_pallas", "interpret")
)
def group_norm_silu(x, scale, bias, num_groups=32, eps=1e-5, use_pallas=True,
                    interpret=False):
    """Fused GroupNorm+SiLU.

    :param x: (N, ..., C) activation, stats over all non-batch axes per group.
    :param interpret: run the kernel in the Pallas interpreter (CPU testing).
    """
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not use_pallas or (not on_tpu and not interpret):
        return group_norm_silu_reference(x, scale, bias, num_groups, eps)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    N, C = x.shape[0], x.shape[-1]
    S = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(N, S, C)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, num_groups=num_groups, eps=eps),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, S, C), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, S, C), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x3, scale.astype(jnp.float32), bias.astype(jnp.float32))
    return out.reshape(orig_shape)
