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


def group_norm_silu_reference(x, scale, bias, mod_scale=None, mod_bias=None,
                              num_groups=32, eps=1e-5):
    """Reference: GroupNorm over (spatial..., group-channels) in f32, then
    scale/shift, then optional per-sample FiLM modulation h*(1+ms)+mb, then
    SiLU; matches models.nn.GroupNorm32(act='silu')."""
    orig_dtype = x.dtype
    N = x.shape[0]
    C = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(N, -1, num_groups, C // num_groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xn = (xf - mean) * jax.lax.rsqrt(var + eps)
    xn = xn.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if mod_scale is not None:
        bshape = (N,) + (1,) * (x.ndim - 2) + (C,)
        xn = xn * (1.0 + mod_scale.astype(jnp.float32).reshape(bshape)) \
            + mod_bias.astype(jnp.float32).reshape(bshape)
    return (xn * jax.nn.sigmoid(xn)).astype(orig_dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, ms_ref, mb_ref, o_ref,
                    *, num_groups, eps, use_mod):
    # x block: (1, S, C) — all spatial positions of one sample in VMEM
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    S, C = x.shape
    G = num_groups
    n_per_group = S * (C // G)
    # group statistics via a one-hot (C, G) assignment matmul — Mosaic
    # dislikes lane-dim reshapes, matmuls it loves (same trick as
    # fused_attention.py)
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (c_ids // (C // G) == g_ids).astype(jnp.float32)
    sums = jnp.dot(x, M, preferred_element_type=jnp.float32).sum(
        axis=0, keepdims=True
    )  # (1, G)
    sqs = jnp.dot(x * x, M, preferred_element_type=jnp.float32).sum(
        axis=0, keepdims=True
    )
    mean_g = sums / n_per_group
    var_g = sqs / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(rstd_g, M.T, preferred_element_type=jnp.float32)
    xn = (x - mean_c) * rstd_c
    xn = xn * scale_ref[:] + bias_ref[:]
    if use_mod:
        # per-sample FiLM modulation (scale-shift GroupNorm in ResBlock)
        xn = xn * (1.0 + ms_ref[0, 0]) + mb_ref[0, 0]
    o_ref[0] = (xn * jax.nn.sigmoid(xn)).astype(o_ref.dtype)


def _gn_silu_kernel_tiled(x_ref, scale_ref, bias_ref, ms_ref, mb_ref, o_ref,
                          acc_ref, *, num_groups, eps, use_mod, n_per_group):
    """Two-phase variant for samples whose (S, C) slab exceeds VMEM: grid is
    (N, 2, S_tiles); phase 0 accumulates per-group sum/sum-of-squares over the
    S tiles into scratch, phase 1 revisits the tiles to normalize+SiLU+write
    (the phase-0 visits of the output block write garbage that phase 1
    overwrites)."""
    from jax.experimental import pallas as pl

    phase = pl.program_id(1)
    s_idx = pl.program_id(2)
    x = x_ref[0].astype(jnp.float32)  # (S_tile, C)
    _, C = x.shape
    G = num_groups
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (c_ids // (C // G) == g_ids).astype(jnp.float32)

    @pl.when(jnp.logical_and(phase == 0, s_idx == 0))
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when(phase == 0)
    def _():
        sums = jnp.dot(x, M, preferred_element_type=jnp.float32).sum(
            axis=0, keepdims=True
        )
        sqs = jnp.dot(x * x, M, preferred_element_type=jnp.float32).sum(
            axis=0, keepdims=True
        )
        acc_ref[0:1] += sums
        acc_ref[1:2] += sqs

    @pl.when(phase == 1)
    def _():
        mean_g = acc_ref[0:1] / n_per_group  # (1, G)
        var_g = acc_ref[1:2] / n_per_group - mean_g * mean_g
        rstd_g = jax.lax.rsqrt(var_g + eps)
        mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)
        rstd_c = jnp.dot(rstd_g, M.T, preferred_element_type=jnp.float32)
        xn = (x - mean_c) * rstd_c
        xn = xn * scale_ref[:] + bias_ref[:]
        if use_mod:
            xn = xn * (1.0 + ms_ref[0, 0]) + mb_ref[0, 0]
        o_ref[0] = (xn * jax.nn.sigmoid(xn)).astype(o_ref.dtype)


# largest f32 elements a single-block sample slab may occupy in VMEM (the
# kernel holds ~4 f32 copies of the block; 600k*4*4 ≈ 9.6 MB)
_GN_SINGLE_BLOCK_ELEMS = 600_000


@functools.partial(
    jax.jit, static_argnames=("num_groups", "eps", "use_pallas", "interpret")
)
def group_norm_silu(x, scale, bias, mod_scale=None, mod_bias=None,
                    num_groups=32, eps=1e-5, use_pallas=True, interpret=False):
    """Fused GroupNorm (+ optional per-sample FiLM modulation) + SiLU.

    :param x: (N, ..., C) activation, stats over all non-batch axes per group.
    :param mod_scale/mod_bias: optional (N, C)-broadcastable per-sample FiLM
        terms, applied as h*(1+mod_scale)+mod_bias after the GroupNorm affine
        (the scale-shift-norm path of ResBlock).
    :param interpret: run the kernel in the Pallas interpreter (CPU testing).
    """
    on_tpu = jax.default_backend() in ("tpu", "axon")
    if not use_pallas or (not on_tpu and not interpret):
        return group_norm_silu_reference(
            x, scale, bias, mod_scale, mod_bias, num_groups, eps
        )
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    orig_shape = x.shape
    N, C = x.shape[0], x.shape[-1]
    S = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(N, S, C)
    use_mod = mod_scale is not None
    # (N, 1, C) with a (1, 1, C) block keeps the trailing two block dims equal
    # to the array dims (Mosaic tiling rule)
    if use_mod:
        ms = mod_scale.astype(jnp.float32).reshape(N, 1, C)
        mb = mod_bias.astype(jnp.float32).reshape(N, 1, C)
        mod_spec = pl.BlockSpec((1, 1, C), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        ms = mb = jnp.zeros((1, 1, C), dtype=jnp.float32)
        mod_spec = pl.BlockSpec((1, 1, C), lambda i: (0, 0, 0),
                                memory_space=pltpu.VMEM)
    if S * C <= _GN_SINGLE_BLOCK_ELEMS:
        out = pl.pallas_call(
            functools.partial(
                _gn_silu_kernel, num_groups=num_groups, eps=eps,
                use_mod=use_mod,
            ),
            out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
            grid=(N,),
            in_specs=[
                pl.BlockSpec((1, S, C), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                mod_spec,
                mod_spec,
            ],
            out_specs=pl.BlockSpec((1, S, C), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x3, scale.astype(jnp.float32), bias.astype(jnp.float32), ms, mb)
        return out.reshape(orig_shape)

    # large-S samples: two-phase tiled kernel
    s_tile = max(1, _GN_SINGLE_BLOCK_ELEMS // C)
    while S % s_tile:
        s_tile -= 1
    n_s_tiles = S // s_tile
    mod_idx3 = (
        (lambda n, p, s: (n, 0, 0)) if use_mod else (lambda n, p, s: (0, 0, 0))
    )
    mod_spec3 = pl.BlockSpec((1, 1, C), mod_idx3, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _gn_silu_kernel_tiled, num_groups=num_groups, eps=eps,
            use_mod=use_mod, n_per_group=S * (C // num_groups),
        ),
        out_shape=jax.ShapeDtypeStruct(x3.shape, x.dtype),
        grid=(N, 2, n_s_tiles),
        in_specs=[
            pl.BlockSpec((1, s_tile, C), lambda n, p, s: (n, s, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            mod_spec3,
            mod_spec3,
        ],
        out_specs=pl.BlockSpec((1, s_tile, C), lambda n, p, s: (n, s, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, num_groups), jnp.float32)],
        interpret=interpret,
    )(x3, scale.astype(jnp.float32), bias.astype(jnp.float32), ms, mb)
    return out.reshape(orig_shape)
