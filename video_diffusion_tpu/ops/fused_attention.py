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

The kernel itself is forward-only; ``fused_rpe_attention_trainable`` wraps
it in a custom VJP whose backward is the rematerialized einsum expression
(see bottom of file), so the same fused forward serves training too.
Parity-tested against the reference path in tests/test_pallas.py (interpret
mode) and on-device in /tmp probes.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np


import os


def _pick_tile(D, T, C, budget_bytes=None, dense=False, num_heads=1):
    """Largest divisor of D whose tile fits the VMEM budget (empirical
    accounting: ~12 f32 copies of the (T, C) pixel row live at once, plus
    attention scratch, plus double-buffered in/out blocks). Budget tunable
    via VDT_ATTN_TILE_MB — resolved in the *unjitted* ``fused_rpe_attention``
    entry point and threaded through as a static jit argument, so a changed
    env value re-keys the jit cache instead of being silently ignored after
    the first trace of a shape.

    The dense (head-packed) variant wants LARGE tiles: dT is the M dimension
    of every packed matmul, so a 128-row tile keeps the MXU's sublanes full
    where the loop variant was indifferent (its dots were (T, F) @ (F, T)
    regardless of dT). Budget scaled by the packed working set instead."""
    if budget_bytes is None:
        budget_bytes = (40 if dense else 80) * 2**20
    HT = num_heads * T
    if dense:
        per_pixel = T * C * 4 * 12 + HT * HT * 4 * 4
    else:
        per_pixel = T * C * 4 * 12 + T * T * 4 * 6
    max_dt = max(1, budget_bytes // max(per_pixel, 1))
    dt = int(min(D, max_dt))
    while D % dt:
        dt -= 1
    return dt


def _softmax(attn, mode):
    """Softmax over the last axis of an f32 score tensor.

    mode "f32": jax.nn.softmax (max-subtract, f32 exp).
    mode "bf16": f32 max-subtract, then exp/divide in bf16 — the exp pass
    is the VPU bottleneck of the spatial kernel (no RPE there, scores are
    max-subtracted so exp inputs are <= 0, and attention weights tolerate
    ~3-digit precision). Opt-in via VDT_ATTN_SOFTMAX=bf16; NOT bit-identical
    to the einsum path, so parity tests pin mode f32."""
    if mode == "bf16":
        m = jnp.max(attn, axis=-1, keepdims=True)
        e = jnp.exp((attn - m).astype(jnp.bfloat16))
        s = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
        return e.astype(jnp.float32) / s
    return jax.nn.softmax(attn, axis=-1)


def _kernel(
    x_ref, gns_ref, gnb_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
    rk_ref, rq_ref, rv_ref, bias_ref, o_ref, *scratch,
    num_heads, num_groups, eps, scale, use_rpe, use_mask,
    in_transposed=False, out_transposed=False, dense=False,
    softmax_mode="f32", dot_bf16=False,
):
    from jax.experimental import pallas as pl

    x = x_ref[0]  # (dT, T, C) — or (T, dT, C) when in_transposed
    if in_transposed:
        x = x.transpose(1, 0, 2)
    dT, T, C = x.shape
    H = num_heads
    F = wqkv_ref.shape[1] // (3 * H)  # may be 128-padded (see _pad_heads)
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

    sec = H * F  # width of each of the q/k/v sections (==C unless padded)

    # operand dtype for the score/value dots: the qkv output is f32 (bias add
    # + f32 accumulation), so by default the attention dots run with f32
    # operands at HALF the MXU's bf16 rate. dot_bf16 narrows the *operands*
    # to bf16 while keeping f32 accumulation (preferred_element_type) — the
    # same contract as the bf16 qkv/proj matmuls either side of it. Scores
    # change by O(1e-3) relative; softmax output tolerance is covered by the
    # same argument as _softmax's bf16 mode. Opt-in via VDT_ATTN_DOT_BF16.
    dot_t = jnp.bfloat16 if dot_bf16 else jnp.float32

    if dense:
        # ---- head-packed ("dense group") attention ---------------------- #
        # The loop variant's dots are (T, F) @ (F, T) batched over dT — at
        # T=20 that is a 20x20 output on a 128x128 MXU tile (~2.4%
        # utilization) and the per-head Python loop serializes H of them.
        # Pack all heads into the token axis (rows/cols (h, t), HT = H*T):
        # ONE (HT, F) @ (F, HT) dot per pixel computes every head's scores;
        # off-diagonal head blocks are masked to -1e9 so the full-width
        # softmax equals the blockwise one EXACTLY (exp underflows to 0.0),
        # and the value matmul's off-block contributions vanish with it.
        # RPE terms become single batched dots with N = HT instead of T.
        # Worth H x the score/value flops (attention dots are ~5% of the
        # block's flops — the projections dominate) for ~16x better MXU
        # tile occupancy; only used when T is small (see fused_rpe_attention).
        HT = H * T
        # All head-packing scaffolding that does NOT depend on the pixel
        # tile d — the tiled R tensors and the combined head-block/user
        # mask — lives in VMEM scratch, filled once per batch row (grid is
        # (b, d) with d innermost) instead of rebuilt every grid step: the
        # concats are multi-MB VPU copies and were ~20% of kernel time.
        if use_rpe:
            rkt_s, rqt_s, rvt_s, mask_s = scratch
        else:
            (mask_s,) = scratch

        @pl.when(pl.program_id(1) == 0)
        def _fill_scratch():
            # combined additive mask: off-head-block entries get -1e9 (the
            # full-width softmax then equals the blockwise one exactly —
            # exp underflows to 0.0); user bias rides on top. Adding (not
            # overwriting with) -1e9 keeps the same exact-zero softmax
            # result since scores are O(30) while -1e9 dominates.
            row_h = jax.lax.broadcasted_iota(jnp.int32, (HT, HT), 0) // T
            col_h = jax.lax.broadcasted_iota(jnp.int32, (HT, HT), 1) // T
            m = jnp.where(row_h == col_h, 0.0, -1e9).astype(jnp.float32)
            if use_mask:
                b = bias_ref[0]  # (T, S)
                b = jnp.concatenate([b] * H, axis=0)  # rows (h, t)
                b = jnp.concatenate([b] * H, axis=1)  # cols (h', s)
                m = m + b
            mask_s[...] = m
            if use_rpe:
                # R refs arrive pre-transposed to (H, T, S, F) (done once
                # in XLA outside the kernel), so row packing is a pure dim
                # merge; the column head tiling is the concat cached here.
                rk_rows = rk_ref[0].astype(jnp.float32).reshape(HT, T, F)
                rkt_s[...] = jnp.concatenate([rk_rows] * H, axis=1)
                rq_rows = rq_ref[0].astype(jnp.float32).reshape(HT, T, F)
                rqt_s[...] = jnp.concatenate([rq_rows] * H, axis=1)
                rv_rows = rv_ref[0].astype(jnp.float32).reshape(HT, T, F)
                rvt_s[...] = jnp.concatenate([rv_rows] * H, axis=1)

        # per-head lane slices, each materialized at offset 0 by its
        # reshape before the sublane concat (Mosaic cannot concatenate
        # operands whose lane offsets differ on a non-concat dimension)
        qp = jnp.concatenate(
            [(qkv[:, h * F:(h + 1) * F] * scale).reshape(dT, T, F)
             for h in range(H)], axis=1,
        )  # (dT, HT, F)
        kp = jnp.concatenate(
            [qkv[:, sec + h * F: sec + (h + 1) * F].reshape(dT, T, F)
             for h in range(H)], axis=1,
        )
        vp = jnp.concatenate(
            [qkv[:, 2 * sec + h * F: 2 * sec + (h + 1) * F].reshape(dT, T, F)
             for h in range(H)], axis=1,
        )
        attn = jax.lax.dot_general(
            qp.astype(dot_t), kp.astype(dot_t),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (dT, HT, HT)
        if use_rpe:
            # row-batched: rows (h, t) each contract their own R matrix,
            # tiled over the column head block h' (off-block columns are
            # -1e9-masked before softmax, so their garbage never surfaces)
            # attn[d, (ht), (h's)] += sum_f q[d,(ht),f] * Rk[t,s,h,f]
            attn += jax.lax.dot_general(
                qp.astype(dot_t).transpose(1, 0, 2),  # (HT, dT, F)
                rkt_s[:].astype(dot_t),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
            # attn[d, (h t), (h s)] += sum_f k_scaled[d,(hs),f] * Rq[s,t,h,f]
            attn += jax.lax.dot_general(
                (kp * scale).astype(dot_t).transpose(1, 0, 2),  # (HS, dT, F)
                rqt_s[:].astype(dot_t),
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 2, 0)  # (HS, dT, HT) -> (dT, HT, HS)
        attn += mask_s[:][None]
        attn = _softmax(attn, softmax_mode)
        out_p = jax.lax.dot_general(
            attn.astype(dot_t), vp.astype(dot_t),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (dT, HT, F)
        if use_rpe:
            # out[d,(ht),f] += sum_s attn[d,(ht),(hs)] * Rv[t,s,h,f]
            out_p += jax.lax.dot_general(
                attn.astype(dot_t).transpose(1, 0, 2),  # (HT, dT, HS)
                rvt_s[:].astype(dot_t),
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
        out = jnp.concatenate(
            [out_p[:, h * T:(h + 1) * T, :].reshape(dT * T, F)
             for h in range(H)], axis=-1,
        )  # (dT*T, H*F)
        out = (
            jnp.dot(
                out.astype(wproj_ref.dtype), wproj_ref[:],
                preferred_element_type=jnp.float32,
            )
            + bproj_ref[:]
        )
        res = (xn2 + out).reshape(dT, T, C)
        if out_transposed:
            res = res.transpose(1, 0, 2)
        o_ref[0] = res.astype(o_ref.dtype)
        return

    head_outs = []
    for h in range(H):
        # per-head lane slices of the qkv output (layout: [3][H][F])
        qh = (qkv[:, h * F:(h + 1) * F] * scale).reshape(dT, T, F)
        kh = qkv[:, sec + h * F: sec + (h + 1) * F].reshape(dT, T, F)
        vh = qkv[:, 2 * sec + h * F: 2 * sec + (h + 1) * F].reshape(dT, T, F)
        attn = jax.lax.dot_general(
            qh.astype(dot_t), kh.astype(dot_t),
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (dT, T, T)
        if use_rpe:
            rk = rk_ref[0, :, :, h].astype(dot_t)  # (T, S, F)
            rq = rq_ref[0, :, :, h].astype(dot_t)
            # attn[d,t,s] += sum_f q[d,t,f] * Rk[t,s,f]   (batch over t)
            attn += jax.lax.dot_general(
                qh.astype(dot_t).transpose(1, 0, 2),  # (t, dT, F)
                rk,                     # (t, S, F)
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
            # attn[d,t,s] += sum_f k_scaled[d,s,f] * Rq[s,t,f]  (batch over s)
            add = jax.lax.dot_general(
                (kh * scale).astype(dot_t).transpose(1, 0, 2),  # (s, dT, F)
                rq,                               # (s, T(t), F)
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )  # (s, dT, t)
            attn += add.transpose(1, 2, 0)
        if use_mask:
            attn += bias_ref[0][None]
        attn = _softmax(attn, softmax_mode)
        out_h = jax.lax.dot_general(
            attn.astype(dot_t), vh.astype(dot_t),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (dT, T, F)
        if use_rpe:
            rv = rv_ref[0, :, :, h].astype(dot_t)  # (T, S, F)
            # out[d,t,f] += sum_s attn[d,t,s] * Rv[t,s,f]   (batch over t)
            out_h += jax.lax.dot_general(
                attn.astype(dot_t).transpose(1, 0, 2),  # (t, dT, s)
                rv,                        # (t, s, F)
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).transpose(1, 0, 2)
        head_outs.append(out_h.reshape(dT * T, F))

    out = jnp.concatenate(head_outs, axis=-1)  # (dT*T, H*F)
    out = (
        jnp.dot(
            out.astype(wproj_ref.dtype), wproj_ref[:],
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[:]
    )
    res = (xn2 + out).reshape(dT, T, C)
    if out_transposed:
        res = res.transpose(1, 0, 2)
    o_ref[0] = res.astype(o_ref.dtype)


def fused_rpe_attention(
    x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    r_k=None, r_q=None, r_v=None, mask_bias=None,
    *, num_heads, num_groups=32, eps=1e-5, interpret=False,
    in_transposed=False, out_transposed=False, dense=None,
    softmax_mode=None, dot_bf16=None,
):
    """Entry point: resolves the env-driven choices (head packing, softmax
    precision) OUTSIDE the jit so they participate in the cache key and env
    changes between calls are honoured, then dispatches to the jitted
    implementation.

    dense=None (default) resolves VDT_ATTN_DENSE (auto/0/1); auto enables
    head packing when the token axis is short (H*T <= 128 — temporal
    attention), where the per-head dots would waste the MXU tile; measured
    on-device: dense wins ~16% at H*T=80 but LOSES ~9% at H*T=256 (spatial
    ds8), see baselines/attention_kernel_bench.json.

    softmax_mode=None resolves VDT_ATTN_SOFTMAX (f32 default / bf16); bf16
    runs the exp/divide passes — the VPU bottleneck of the spatial kernel —
    in half precision (not bit-identical; see _softmax)."""
    if dense is None:
        dense_mode = os.environ.get("VDT_ATTN_DENSE", "auto")
        if dense_mode in ("0", "1"):
            dense = dense_mode == "1"
        else:
            T = x.shape[1] if in_transposed else x.shape[2]
            dense = num_heads * T <= 128
        # the packed layout needs 128-aligned head slices (Mosaic cannot
        # concatenate lane slices at sub-tile offsets); heads of F < 64
        # are never padded that far (see pad auto), so fall back to loop
        F_logical = x.shape[-1] // num_heads
        if F_logical < 64:
            dense = False
    if softmax_mode is None:
        softmax_mode = os.environ.get("VDT_ATTN_SOFTMAX", "f32")
    if dot_bf16 is None:
        # bf16 *operands* for the score/value/RPE dots (f32 accumulation):
        # the qkv output is f32, so these dots otherwise run at the MXU's
        # half-rate f32 throughput. Opt-in pending the on-device A/B.
        dot_bf16 = os.environ.get("VDT_ATTN_DOT_BF16", "0") == "1"
    # resolve the VMEM tile budget here (unjitted) so it participates in
    # the jit cache key; None = _pick_tile's dense-dependent default
    tile_mb = os.environ.get("VDT_ATTN_TILE_MB", "")
    tile_budget_bytes = int(float(tile_mb) * 2**20) if tile_mb else None
    return _fused_rpe_attention_impl(
        x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
        r_k, r_q, r_v, mask_bias,
        num_heads=num_heads, num_groups=num_groups, eps=eps,
        interpret=interpret, in_transposed=in_transposed,
        out_transposed=out_transposed, dense=dense,
        softmax_mode=softmax_mode, dot_bf16=dot_bf16,
        tile_budget_bytes=tile_budget_bytes,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "num_heads", "num_groups", "eps", "interpret",
        "in_transposed", "out_transposed", "dense", "softmax_mode",
        "dot_bf16", "tile_budget_bytes",
    ),
)
def _fused_rpe_attention_impl(
    x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    r_k=None, r_q=None, r_v=None, mask_bias=None,
    *, num_heads, num_groups=32, eps=1e-5, interpret=False,
    in_transposed=False, out_transposed=False, dense=False,
    softmax_mode="f32", dot_bf16=False, tile_budget_bytes=None,
):
    """x: (B, D, T, C) -> (B, D, T, C). R tensors: (B, T, T, H, F) or None;
    mask_bias: (B, T, T) additive (0 / large-negative) or None.

    ``in_transposed`` / ``out_transposed`` read/write the activation in
    (B, T, D, C) layout instead, moving the factorized-attention
    temporal<->spatial transpose into the kernel's VMEM tile (the XLA-level
    layout copies were 5.9% of rollout device time, BENCH.md)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if in_transposed:
        B, T, D, C = x.shape
    else:
        B, D, T, C = x.shape
    H = num_heads
    F = C // H
    scale = F**-0.5  # from the LOGICAL head dim, not the padded one
    use_rpe = r_k is not None
    use_mask = mask_bias is not None

    # Lane alignment: per-head slices of the qkv output at offsets h*F cross
    # 128-lane boundaries when F is not a multiple of the lane tile (F=96 at
    # C=384), forcing Mosaic relayouts around every head's dots. Zero-pad
    # each head block to Fp lanes (weight-layout transform, numerically
    # exact: padded q/k columns contribute 0 to the contractions and padded
    # proj rows are zero).
    pad_mode = os.environ.get("VDT_ATTN_PAD_HEADS", "auto")
    if pad_mode == "0":
        Fp = F
    elif pad_mode == "1":
        Fp = -(-F // 128) * 128
    else:
        # auto: fix 96->128-style misalignment, but don't blow up small
        # heads (32->128 would 4x the attention-section matmul width)
        Fp = -(-F // 128) * 128 if (F >= 64 and F % 64 != 0) else F
    if Fp != F:
        w_qkv = jnp.pad(
            w_qkv.reshape(C, 3, H, F), ((0, 0), (0, 0), (0, 0), (0, Fp - F))
        ).reshape(C, 3 * H * Fp)
        b_qkv = jnp.pad(
            b_qkv.reshape(3, H, F), ((0, 0), (0, 0), (0, Fp - F))
        ).reshape(3 * H * Fp)
        w_proj = jnp.pad(
            w_proj.reshape(H, F, C), ((0, 0), (0, Fp - F), (0, 0))
        ).reshape(H * Fp, C)
        if use_rpe:
            pad_last = ((0, 0),) * 4 + ((0, Fp - F),)
            r_k = jnp.pad(r_k, pad_last)
            r_q = jnp.pad(r_q, pad_last)
            r_v = jnp.pad(r_v, pad_last)
    F = Fp

    if not use_rpe:
        r_k = r_q = r_v = jnp.zeros((B, 1, 1, H, F), dtype=x.dtype)
    if not use_mask:
        mask_bias = jnp.zeros((B, 1, 1), dtype=jnp.float32)
    else:
        # -inf would make masked-all rows NaN under softmax even when unused;
        # a large negative is exact for T <= a few hundred tokens
        mask_bias = jnp.maximum(mask_bias, -1e9)

    dT = _pick_tile(
        D, T, C, budget_bytes=tile_budget_bytes, dense=dense, num_heads=H
    )
    grid = (B, D // dT)
    rT = r_k.shape[1]
    mT = mask_bias.shape[1]

    if dense and use_rpe:
        # hand the kernel (B, H, T, S, F)-ordered R tensors so its head
        # packing is a pure dim merge (in-kernel transposes are Mosaic
        # relayouts per grid step; this one runs once, fused, in XLA)
        r_k = r_k.transpose(0, 3, 1, 2, 4)
        r_q = r_q.transpose(0, 3, 1, 2, 4)
        r_v = r_v.transpose(0, 3, 1, 2, 4)
        r_spec = pl.BlockSpec((1, H, rT, rT, F), lambda b, d: (b, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    else:
        r_spec = pl.BlockSpec((1, rT, rT, H, F), lambda b, d: (b, 0, 0, 0, 0),
                              memory_space=pltpu.VMEM)

    if in_transposed:
        x_spec = pl.BlockSpec((1, T, dT, C), lambda b, d: (b, 0, d, 0),
                              memory_space=pltpu.VMEM)
    else:
        x_spec = pl.BlockSpec((1, dT, T, C), lambda b, d: (b, d, 0, 0),
                              memory_space=pltpu.VMEM)
    if out_transposed:
        out_shape = jax.ShapeDtypeStruct((B, T, D, C), x.dtype)
        out_spec = pl.BlockSpec((1, T, dT, C), lambda b, d: (b, 0, d, 0),
                                memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((B, D, T, C), x.dtype)
        out_spec = pl.BlockSpec((1, dT, T, C), lambda b, d: (b, d, 0, 0),
                                memory_space=pltpu.VMEM)

    scratch_shapes = []
    if dense:
        # per-batch-row cached packing scaffolding (see _kernel)
        HT = H * T
        if use_rpe:
            scratch_shapes += [
                pltpu.VMEM((HT, HT, F), jnp.float32) for _ in range(3)
            ]
        scratch_shapes.append(pltpu.VMEM((HT, HT), jnp.float32))

    out = pl.pallas_call(
        functools.partial(
            _kernel,
            num_heads=H, num_groups=num_groups, eps=eps, scale=scale,
            use_rpe=use_rpe, use_mask=use_mask,
            in_transposed=in_transposed, out_transposed=out_transposed,
            dense=dense, softmax_mode=softmax_mode or "f32",
            dot_bf16=dot_bf16,
        ),
        out_shape=out_shape,
        grid=grid,
        scratch_shapes=scratch_shapes,
        in_specs=[
            x_spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gn scale
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gn bias
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_qkv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_qkv
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w_proj
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b_proj
            r_spec,
            r_spec,
            r_spec,
            pl.BlockSpec((1, mT, mT), lambda b, d: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
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


# --------------------------------------------------------------------------- #
# Trainable wrapper: kernel forward + rematerialized einsum backward.
#
# The kernel itself is forward-only; for the training path we register a
# custom VJP whose backward re-expresses the block as plain einsums (the
# exact math the kernel implements) and lets XLA differentiate that —
# flash-attention-style rematerialization without a hand-written backward
# kernel. Forward runs the fast fused kernel; backward costs one einsum
# forward recompute + the einsum VJP (which the pure-XLA training path paid
# anyway when use_checkpoint rematerializes).
# --------------------------------------------------------------------------- #


def _reference_forward(
    statics, x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    r_k, r_q, r_v, mask_bias,
):
    """Pure-jnp replica of the kernel semantics (models/unet.py einsum path,
    reference unet.py:395-540), used only to derive the backward."""
    num_heads, num_groups, eps, in_t, out_t = statics[:5]
    if in_t:
        x = x.transpose(0, 2, 1, 3)
    B, D, T, C = x.shape
    H = num_heads
    F = C // H
    scale = F**-0.5
    xf = x.astype(jnp.float32).reshape(B, D, T, num_groups, C // num_groups)
    mean = xf.mean(axis=(2, 4), keepdims=True)
    var = xf.var(axis=(2, 4), keepdims=True)
    xn = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(B, D, T, C)
    xn = xn * gn_scale + gn_bias
    qkv = (
        xn.astype(x.dtype) @ w_qkv.astype(x.dtype)
    ).astype(jnp.float32) + b_qkv
    qkv = qkv.reshape(B, D, T, 3, H, F)
    q = qkv[..., 0, :, :] * scale
    k = qkv[..., 1, :, :]
    v = qkv[..., 2, :, :]
    attn = jnp.einsum("bdihf,bdjhf->bdhij", q, k)
    if r_k is not None:
        attn = attn + jnp.einsum(
            "bdihf,bijhf->bdhij", q, r_k.astype(jnp.float32)
        )
    if r_q is not None:
        attn = attn + jnp.einsum(
            "bdjhf,bjihf->bdhij", k * scale, r_q.astype(jnp.float32)
        )
    if mask_bias is not None:
        attn = attn + jnp.maximum(mask_bias, -1e9)[:, None, None]
    attn = jax.nn.softmax(attn, axis=-1)
    out = jnp.einsum("bdhij,bdjhf->bdihf", attn, v)
    if r_v is not None:
        out = out + jnp.einsum(
            "bdhij,bijhf->bdihf", attn, r_v.astype(jnp.float32)
        )
    out = out.reshape(B, D, T, C)
    out = (
        out.astype(x.dtype) @ w_proj.astype(x.dtype)
    ).astype(jnp.float32) + b_proj
    res = xn + out
    if out_t:
        res = res.transpose(0, 2, 1, 3)
    return res.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _trainable(
    statics, x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    r_k, r_q, r_v, mask_bias,
):
    num_heads, num_groups, eps, in_t, out_t = statics[:5]
    interpret = statics[5] if len(statics) > 5 else False
    return fused_rpe_attention(
        x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
        r_k=r_k, r_q=r_q, r_v=r_v, mask_bias=mask_bias,
        num_heads=num_heads, num_groups=num_groups, eps=eps,
        in_transposed=in_t, out_transposed=out_t, interpret=interpret,
    )


def _trainable_fwd(statics, *args):
    return _trainable(statics, *args), args


def _trainable_bwd(statics, args, g):
    _, vjp = jax.vjp(lambda *a: _reference_forward(statics, *a), *args)
    return vjp(g)


_trainable.defvjp(_trainable_fwd, _trainable_bwd)


def fused_rpe_attention_trainable(
    x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
    r_k=None, r_q=None, r_v=None, mask_bias=None,
    *, num_heads, num_groups=32, eps=1e-5,
    in_transposed=False, out_transposed=False, interpret=False,
):
    """fused_rpe_attention with a registered backward (see module note).

    Drop-in for the training path: gradients flow to x, the GroupNorm and
    projection parameters, and the R tensors (and through them into
    RPENet)."""
    statics = (
        num_heads, num_groups, eps, in_transposed, out_transposed, interpret
    )
    return _trainable(
        statics, x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
        r_k, r_q, r_v, mask_bias,
    )
