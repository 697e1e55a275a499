"""Fused RPE attention Pallas kernel.

One kernel computes the entire RPEAttention block (models/unet.py):
GroupNorm pre-norm -> qkv projection -> scaled dot-product attention with
optional relative-position terms on q/k/v and an additive mask bias ->
output projection -> residual onto the normalized input. The token axis T is
tiny (frames <= 20, or pixels <= 256), so XLA's unfused execution is
dominated by HBM round trips of the (B, D, T, C) activations; fusing keeps
everything in VMEM for one read + one write.

Mosaic constraints shaped the implementation:
* the lane (last) dimension is never reshaped — per-head tensors come from
  lane slices of the (N, 3C) qkv matmul output, and GroupNorm group
  statistics are computed with a (C, G) one-hot group-assignment MATMUL
  instead of a reshape;
* attention uses rank-3 dot_general with a batch dimension (supported);
* the R tensors (B, T, T, H, F) are shared across the D axis, computed once
  outside the kernel (RPENet / lookup table) and broadcast in — the
  reference recomputes the equivalent per pixel.

Forward-only (sampling / eval): training takes the XLA einsum path, which JAX
differentiates. Parity-tested against the reference path in
tests/test_pallas.py (interpret mode) and on-device in /tmp probes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


import os

_TILE_MB = float(os.environ.get("VDT_ATTN_TILE_MB", "6"))


def _pick_tile(D, T, C, budget_bytes=None):
    """Largest divisor of D whose tile fits the VMEM budget (empirical
    accounting: ~12 f32 copies of the (T, C) pixel row live at once, plus
    attention scratch, plus double-buffered in/out blocks). Budget tunable
    via VDT_ATTN_TILE_MB."""
    if budget_bytes is None:
        budget_bytes = int(_TILE_MB * 2**20)
    per_pixel = T * C * 4 * 12 + T * T * 4 * 6
    max_dt = max(1, budget_bytes // max(per_pixel, 1))
    dt = int(min(D, max_dt))
    while D % dt:
        dt -= 1
    return dt


def _kernel(
    x_ref, gns_ref, gnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    rk_ref, rq_ref, rv_ref, bias_ref, o_ref,
    *, num_heads, num_groups, eps, scale, use_rpe, use_mask,
):
    x = x_ref[0]  # (dT, T, C)
    dT, T, C = x.shape
    H = num_heads
    F = C // H
    G = num_groups
    n_per_group = T * (C // G)

    x2 = x.reshape(dT * T, C).astype(jnp.float32)

    # GroupNorm stats via a one-hot (C, G) group-assignment matmul — no
    # lane-dim reshapes
    c_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 0)
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (C, G), 1)
    M = (c_ids // (C // G) == g_ids).astype(jnp.float32)
    sums = jnp.dot(x2, M, preferred_element_type=jnp.float32)
    sqs = jnp.dot(x2 * x2, M, preferred_element_type=jnp.float32)
    sums = sums.reshape(dT, T, G).sum(axis=1)  # (dT, G)
    sqs = sqs.reshape(dT, T, G).sum(axis=1)
    mean_g = sums / n_per_group
    var_g = sqs / n_per_group - mean_g * mean_g
    rstd_g = jax.lax.rsqrt(var_g + eps)
    mean_c = jnp.dot(mean_g, M.T, preferred_element_type=jnp.float32)  # (dT, C)
    rstd_c = jnp.dot(rstd_g, M.T, preferred_element_type=jnp.float32)

    xn = (x.astype(jnp.float32) - mean_c[:, None, :]) * rstd_c[:, None, :]
    xn = xn * gns_ref[:] + gnb_ref[:]  # (dT, T, C) f32
    xn2 = xn.reshape(dT * T, C)

    qkv = (
        jnp.dot(
            xn2.astype(wqkv_ref.dtype), wqkv_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:]
    )  # (dT*T, 3C) f32

    head_outs = []
    for h in range(H):
        # per-head lane slices of the qkv output (layout: [3][H][F])
        qh = (qkv[:, h * F:(h + 1) * F] * scale).reshape(dT, T, F)
        kh = qkv[:, C + h * F: C + (h + 1) * F].reshape(dT, T, F)
        vh = qkv[:, 2 * C + h * F: 2 * C + (h + 1) * F].reshape(dT, T, F)
        attn = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (dT, T, T)
        if use_rpe:
            rk = rk_ref[0, :, :, h].astype(jnp.float32)  # (T, S, F)
            rq = rq_ref[0, :, :, h].astype(jnp.float32)
            # attn[d,t,s] += sum_f q[d,t,f] * Rk[t,s,f]   (batch over t)
            attn += jax.lax.dot_general(
                qh.transpose(1, 0, 2),  # (t, dT, F)
                rk,                     # (t, S, F)
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
            # attn[d,t,s] += sum_f k_scaled[d,s,f] * Rq[s,t,f]  (batch over s)
            add = jax.lax.dot_general(
                (kh * scale).transpose(1, 0, 2),  # (s, dT, F)
                rq,                               # (s, T(t), F)
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (s, dT, t)
            attn += add.transpose(1, 2, 0)
        if use_mask:
            attn += bias_ref[0][None]
        attn = jax.nn.softmax(attn, axis=-1)
        out_h = jax.lax.dot_general(
            attn, vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (dT, T, F)
        if use_rpe:
            rv = rv_ref[0, :, :, h].astype(jnp.float32)  # (T, S, F)
            # out[d,t,f] += sum_s attn[d,t,s] * Rv[t,s,f]   (batch over t)
            out_h += jax.lax.dot_general(
                attn.transpose(1, 0, 2),  # (t, dT, s)
                rv,                        # (t, s, F)
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
        head_outs.append(out_h.reshape(dT * T, F))

    out = jnp.concatenate(head_outs, axis=-1)  # (dT*T, C)
    out = (
        jnp.dot(
            out.astype(wproj_ref.dtype), wproj_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[:]
    )
    o_ref[0] = (xn2 + out).reshape(dT, T, C).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "num_groups", "eps", "interpret"),
)
def fused_rpe_attention(
    x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    r_k=None, r_q=None, r_v=None, mask_bias=None,
    *, num_heads, num_groups=32, eps=1e-5, interpret=False,
):
    """x: (B, D, T, C) -> (B, D, T, C). R tensors: (B, T, T, H, F) or None;
    mask_bias: (B, T, T) additive (0 / large-negative) or None."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, D, T, C = x.shape
    H = num_heads
    F = C // H
    scale = F**-0.5
    use_rpe = r_k is not None
    use_mask = mask_bias is not None
    if not use_rpe:
        r_k = r_q = r_v = jnp.zeros((B, 1, 1, H, F), dtype=x.dtype)
    if not use_mask:
        mask_bias = jnp.zeros((B, 1, 1), dtype=jnp.float32)
    else:
        # -inf would make masked-all rows NaN under softmax even when unused;
        # a large negative is exact for T <= a few hundred tokens
        mask_bias = jnp.maximum(mask_bias, -1e9)

    dT = _pick_tile(D, T, C)
    grid = (B, D // dT)
    rT = r_k.shape[1]
    mT = mask_bias.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            num_heads=H, num_groups=num_groups, eps=eps, scale=scale,
            use_rpe=use_rpe, use_mask=use_mask,
        ),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, dT, T, C), lambda b, d: (b, d, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gn scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gn bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_qkv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_qkv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_proj
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_proj
            pl.BlockSpec((1, rT, rT, H, F), lambda b, d: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rT, rT, H, F), lambda b, d: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rT, rT, H, F), lambda b, d: (b, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, mT, mT), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dT, T, C), lambda b, d: (b, d, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 2**20,
        ),
        interpret=interpret,
    )(
        x,
        gn_scale.astype(jnp.float32), gn_bias.astype(jnp.float32),
        w_qkv.astype(x.dtype), b_qkv.astype(jnp.float32),
        w_proj.astype(x.dtype), b_proj.astype(jnp.float32),
        r_k, r_q, r_v, mask_bias.astype(jnp.float32),
    )
    return out
