"""Factorized spatio-temporal U-Net in Flax (channels-last, bf16 compute).

TPU-native redesign of /root/reference/improved_diffusion/unet.py:
* all tensors are (B, T, H, W, C); convs run on (B*T, H, W, C) NHWC;
* temporal attention attends over the T axis per pixel, spatial attention over
  H*W per frame, with relative-position bias from either a bucketed iRPE
  lookup table or a continuous RPENet conditioned on the diffusion time
  (unet.py:202-540 semantics);
* the attention mask admits video<->video interactions and (optionally)
  padding<->padding interactions, built as an additive -inf bias
  (unet.py:511-528);
* behavioral quirks of the reference that affect training dynamics are kept:
  the attention residual adds onto the *normalized* input (unet.py:474-538),
  and GroupNorm pre-norms pool statistics over the attended axis.

Divergences (documented):
* learned-variance outputs are stacked on the trailing channel axis;
* image models without RPE parameters simply run attention without relative
  position bias (the reference would assert on bucket_params=None,
  unet.py:423-427);
* fp16 torso conversion is replaced by a bf16 dtype policy.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .nn import GroupNorm32, frame_embedding, timestep_embedding, zero_init

default_kernel_init = nn.initializers.lecun_normal()


def use_fused_attention(use_pallas, capture_attn, backend, head_dim):
    """Shape/backend gate for the fused Pallas attention kernel.

    Routes to the XLA einsum path unless all hold:
    * the model was built with the kernel enabled (``VDT_PALLAS_ATTN=1``),
    * we are not capturing attention maps (the kernel never materializes
      the score matrix),
    * the backend is a real TPU (Mosaic kernels do not run on CPU outside
      interpret-mode tests),
    * the head dim is >= 64: at F < 64 neither kernel variant is usable on
      TPU — the head-packed dense layout needs 128-aligned head slices, and
      the per-head loop path at F=32 (bouncy-balls shapes, C=128/H=4) does
      not finish Mosaic compilation (NOTES_ROUND3.md); einsum is the only
      correct fallback.
    """
    return (
        use_pallas
        and not capture_attn
        and backend in ("tpu", "axon")
        and head_dim >= 64
    )


def _use_dminor_layout(tokens, batch_pixels, train=False):
    """Pick the pixels-on-lanes einsum layout (``VDT_ATTN_DMINOR``: auto/0/1).

    For few-token attention over many pixels (temporal attention: T ~ 10
    tokens, D = H*W pixel batch) the standard einsum layout materializes
    q/k/v with (H, F) in the TPU minor dims (padded ~6x) and the score
    tensor with (T, T) minor (padded up to ~20x) — measured compile-only in
    baselines/qkv_layout_probe.json. Transposing so D rides the lane axis
    makes every big intermediate dense. Spatial attention (tokens = H*W,
    batch = frames) keeps the standard layout, which is already
    lane-aligned there. Read at trace time like the other VDT_ knobs.

    auto excludes the TRAINING graph: the layout was built for the
    inference rollout's HBM ceiling (batched-window sampling), while its
    backward — pure-VPU reduces over broadcast products — measured ~28%
    slower end-to-end on the bb-long training step than the standard
    MXU-dot path (0.14 vs 0.109 s/step, round-4 session 4). Set
    VDT_ATTN_DMINOR=1 to force it everywhere.
    """
    v = os.environ.get("VDT_ATTN_DMINOR", "auto")
    if v == "auto":
        return (not train) and tokens < 64 and batch_pixels >= 64
    return v == "1"


def _pallas_temporal_enabled(tokens, batch_pixels, train=False):
    """Gate the fused Pallas kernel on the TEMPORAL attention axis
    (``VDT_PALLAS_ATTN_TEMPORAL``: auto/0/1).

    The round-4 bench A/B (baselines/bench_ab_r4.json, flagship rollout,
    warm cache, same chip/day) measured the einsum path with the d-minor
    layout faster than the fused kernel on the few-token temporal axis
    (5.611 vs 5.547 frames/s end-to-end), while spatial attention stays
    fastest on the fused kernel. ``auto`` therefore routes temporal
    attention to the einsum path exactly where ``_use_dminor_layout``
    applies (inference, <64 tokens over >=64 pixels) and keeps the fused
    kernel otherwise. ``1`` forces the kernel, ``0`` forces einsum.
    Read at trace time like the other VDT_ knobs.
    """
    v = os.environ.get("VDT_PALLAS_ATTN_TEMPORAL", "auto")
    if v == "auto":
        return not _use_dminor_layout(tokens, batch_pixels, train)
    return v == "1"


def _conv(features, kernel=3, stride=1, zero=False, dtype=jnp.float32, name=None):
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding="SAME" if kernel > 1 else "VALID",
        kernel_init=zero_init if zero else default_kernel_init,
        bias_init=zero_init,
        dtype=dtype,
        name=name,
    )


class Upsample(nn.Module):
    """Nearest x2 upsampling with optional conv (reference unet.py:47-72)."""

    channels: int
    use_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        N, H, W, C = x.shape
        x = jax.image.resize(x, (N, H * 2, W * 2, C), method="nearest")
        if self.use_conv:
            x = _conv(self.channels, 3, dtype=self.dtype, name="conv")(x)
        return x


class Downsample(nn.Module):
    """Stride-2 conv or 2x2 avg-pool downsampling (reference unet.py:75-101)."""

    channels: int
    use_conv: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return _conv(self.channels, 3, stride=2, dtype=self.dtype, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ResBlock(nn.Module):
    """Residual block with timestep-embedding injection, optionally as
    scale-shift GroupNorm (reference unet.py:105-198)."""

    out_channels: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = False
    use_conv_skip: bool = False
    use_pallas: bool = False  # fused GroupNorm+SiLU kernel (inference path)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        in_ch = x.shape[-1]
        h = GroupNorm32(act="silu", use_pallas=self.use_pallas, name="in_norm")(x)
        h = _conv(self.out_channels, 3, dtype=self.dtype, name="in_conv")(h)

        emb_out = nn.Dense(
            2 * self.out_channels if self.use_scale_shift_norm else self.out_channels,
            dtype=self.dtype,
            name="emb_proj",
        )(nn.silu(emb)).astype(h.dtype)
        emb_out = emb_out[:, None, None, :]

        out_norm = GroupNorm32(
            act="silu", use_pallas=self.use_pallas, name="out_norm"
        )
        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out, 2, axis=-1)
            h = out_norm(h, mod_scale=scale, mod_bias=shift)
        else:
            h = out_norm(h + emb_out)
        h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = _conv(self.out_channels, 3, zero=True, dtype=self.dtype, name="out_conv")(h)

        if self.out_channels == in_ch:
            skip = x
        elif self.use_conv_skip:
            skip = _conv(self.out_channels, 3, dtype=self.dtype, name="skip")(x)
        else:
            skip = _conv(self.out_channels, 1, dtype=self.dtype, name="skip")(x)
        return skip + h


class RPENet(nn.Module):
    """Continuous relative-position bias net conditioned on diffusion time
    (reference unet.py:271-298): features [log(1+d+), log(1+d-), 1{d=0}] plus
    the per-frame time embedding, through SiLU and a zero-init out layer."""

    channels: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb, relative_distances):
        # temb: (B, T, E); relative_distances: (B, T, T) int
        d = relative_distances.astype(jnp.float32)
        distance_embs = jnp.stack(
            [
                jnp.log1p(jnp.clip(d, min=0)),
                jnp.log1p(jnp.clip(-d, min=0)),
                (d == 0).astype(jnp.float32),
            ],
            axis=-1,
        ).astype(self.dtype)  # (B, T, T, 3)
        emb = (
            nn.Dense(self.channels, dtype=self.dtype, name="embed_diffusion_time")(temb)[
                :, :, None, :
            ]
            + nn.Dense(self.channels, dtype=self.dtype, name="embed_distances")(
                distance_embs
            )
        )  # (B, T, T, C)
        out = nn.Dense(
            self.channels,
            kernel_init=zero_init,
            bias_init=zero_init,
            dtype=self.dtype,
            name="out",
        )(nn.silu(emb))
        B, T, _, C = out.shape
        return out.reshape(B, T, T, self.num_heads, C // self.num_heads)


class RPE(nn.Module):
    """Relative position encoding: iRPE bucketed table (eq. 18 of
    arXiv:2107.14222) or RPENet (reference unet.py:301-378)."""

    channels: int
    num_heads: int
    use_rpe_net: bool
    alpha: Optional[float] = None
    beta: Optional[float] = None
    gamma: Optional[float] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        if self.use_rpe_net:
            self.rpe_net = RPENet(self.channels, self.num_heads, dtype=self.dtype)
        else:
            assert self.beta is not None
            self.lookup_table_weight = self.param(
                "lookup_table_weight",
                zero_init,
                (2 * int(self.beta) + 1, self.num_heads, self.channels // self.num_heads),
            )

    def get_bucket_ids(self, pairwise_distances):
        # iRPE eq. 18 piecewise log bucketing (reference unet.py:330-340);
        # trunc-toward-zero of the positive magnitude then re-signed.
        alpha, beta, gamma = float(self.alpha), float(self.beta), float(self.gamma)
        d = pairwise_distances.astype(jnp.float32)
        abs_d = jnp.abs(d)
        # guard gamma == alpha (e.g. the rp_* = T defaults): all far distances
        # then land in the outermost bucket instead of NaN
        denom = np.log(gamma / alpha) if gamma > alpha else np.inf
        coef = jnp.log(jnp.maximum(abs_d, 1e-9) / alpha) / denom
        bucketed = jnp.trunc(
            jnp.minimum(beta, alpha + coef * (beta - alpha))
        ) * jnp.sign(d)
        ids = jnp.where(abs_d > alpha, bucketed, d).astype(jnp.int32)
        # torch negative-index semantics into a (2*beta+1)-row table:
        return jnp.mod(ids, 2 * int(beta) + 1)

    def get_R(self, pairwise_distances, temb):
        if self.use_rpe_net:
            return self.rpe_net(temb, pairwise_distances)  # (B,T,T,H,F)
        bucket_ids = self.get_bucket_ids(pairwise_distances)
        return jnp.asarray(self.lookup_table_weight, self.dtype)[bucket_ids]

    def forward_qk(self, qk, pairwise_distances, temb):
        # qk: (B, D, T, H, F); R: (B, T, T, H, F) -> bias (B, D, H, T, T)
        R = self.get_R(pairwise_distances, temb)
        return jnp.einsum("bdthf,btshf->bdhts", qk, R.astype(qk.dtype))

    def forward_v(self, attn, pairwise_distances, temb):
        # attn: (B, D, H, T, T) -> (B, D, T, H, F)
        R = self.get_R(pairwise_distances, temb)
        return jnp.einsum("bdhts,btshf->bdthf", attn, R.astype(attn.dtype))

    def forward_qk_dminor(self, qk, pairwise_distances, temb):
        # d-minor layout (_use_dminor_layout): qk (B, H, T, F, D),
        # R (B, T, S, H, F) -> bias (B, H, T, S, D). Same contraction as
        # forward_qk, pixel axis kept minor; multiply+reduce so XLA's dot
        # canonicalization cannot transpose the big operand back to the
        # padded f-minor layout (see RPEAttention d-minor branch).
        R = self.get_R(pairwise_distances, temb)
        Rt = R.astype(qk.dtype).transpose(0, 3, 1, 2, 4)  # (B, H, T, S, F)
        # (B,H,T,1,F,D) * (B,H,T,S,F,1) -> sum over F -> (B,H,T,S,D)
        return (
            (qk[:, :, :, None] * Rt[..., None])
            .sum(axis=4, dtype=jnp.float32)
            .astype(qk.dtype)
        )

    def forward_v_dminor(self, attn, pairwise_distances, temb):
        # attn (B, H, T, S, D) -> (B, H, T, F, D)
        R = self.get_R(pairwise_distances, temb)
        Rt = R.astype(attn.dtype).transpose(0, 3, 1, 2, 4)  # (B, H, T, S, F)
        # (B,H,T,S,1,D) * (B,H,T,S,F,1) -> sum over S -> (B,H,T,F,D)
        return (
            (attn[:, :, :, :, None] * Rt[..., None])
            .sum(axis=3, dtype=jnp.float32)
            .astype(attn.dtype)
        )

    def __call__(self, x, pairwise_distances, temb, mode):
        if mode == "qk":
            return self.forward_qk(x, pairwise_distances, temb)
        elif mode == "v":
            return self.forward_v(x, pairwise_distances, temb)
        elif mode == "qk_dminor":
            return self.forward_qk_dminor(x, pairwise_distances, temb)
        elif mode == "v_dminor":
            return self.forward_v_dminor(x, pairwise_distances, temb)
        raise ValueError(f"Unexpected RPE attention mode: {mode}")


class RPEAttention(nn.Module):
    """Multi-head attention over the trailing token axis of a (B, D, T, C)
    tensor, with optional iRPE/RPENet relative position terms on q/k/v and a
    video/padding interaction mask (reference unet.py:395-540).

    Note: the residual is added to the *normalized* input, matching the
    reference exactly (unet.py:474, :538).
    """

    channels: int
    num_heads: int
    use_rpe_q: bool = False
    use_rpe_k: bool = False
    use_rpe_v: bool = False
    use_rpe_net: bool = False
    bucket_params: Optional[dict] = None
    allow_interactions_between_padding: bool = True
    use_pallas: bool = False  # fused kernel (inference path only)
    # input/output in (B, T, D, C) token-major layout: the fused kernel
    # absorbs the factorized-attention transpose into its VMEM tile
    transposed_io: bool = False
    dtype: jnp.dtype = jnp.float32

    def _make_rpe(self, name):
        bp = self.bucket_params or {}
        return RPE(
            channels=self.channels,
            num_heads=self.num_heads,
            use_rpe_net=self.use_rpe_net,
            alpha=bp.get("alpha"),
            beta=bp.get("beta"),
            gamma=bp.get("gamma"),
            dtype=self.dtype,
            name=name,
        )

    @nn.compact
    def __call__(
        self,
        x,
        temb=None,
        frame_indices=None,
        attn_mask=None,
        capture_attn=False,
        train=False,
    ):
        if self.transposed_io:
            B, T, D, C = x.shape
        else:
            B, D, T, C = x.shape
        H = self.num_heads
        F = C // H
        scale = F**-0.5

        # raw params (shared by the einsum path and the fused Pallas kernel)
        gn_scale = self.param("norm_scale", nn.initializers.ones_init(), (C,))
        gn_bias = self.param("norm_bias", zero_init, (C,))
        w_qkv = self.param("qkv_kernel", default_kernel_init, (C, 3 * C))
        b_qkv = self.param("qkv_bias", zero_init, (3 * C,))
        w_proj = self.param("proj_kernel", zero_init, (C, C))
        b_proj = self.param("proj_bias", zero_init, (C,))

        use_any_rpe = self.use_rpe_q or self.use_rpe_k or self.use_rpe_v
        if use_any_rpe:
            assert frame_indices is not None
            pairwise_distances = (
                frame_indices[:, :, None] - frame_indices[:, None, :]
            )  # (B, T, T)

        mask_bias = None
        if attn_mask is not None:
            m = attn_mask.astype(jnp.float32)  # (B, T), 1 = real frame
            allowed = m[:, None, :] * m[:, :, None]
            if self.allow_interactions_between_padding:
                allowed = allowed + (1 - m[:, None, :]) * (1 - m[:, :, None])
            else:
                eye = jnp.eye(T, dtype=allowed.dtype)
                allowed = jnp.maximum(allowed, eye[None])
            neg_inf = jnp.asarray(-jnp.inf, dtype=jnp.float32)
            mask_bias = jnp.where(allowed > 0, 0.0, neg_inf)  # (B, T, T)

        if use_fused_attention(
            self.use_pallas, capture_attn, jax.default_backend(), F
        ):
            # fused kernel path: the R tensors are shared across the pixel
            # axis, so compute them once here and broadcast in. The
            # trainable wrapper registers a rematerialized einsum backward,
            # so this path also serves the training graph (custom_vjp).
            from ..ops.fused_attention import fused_rpe_attention_trainable

            r_k = r_q = r_v = None
            if use_any_rpe:
                r_k = self._make_rpe("rpe_k").get_R(pairwise_distances, temb)
                r_q = self._make_rpe("rpe_q").get_R(pairwise_distances, temb)
                r_v = self._make_rpe("rpe_v").get_R(pairwise_distances, temb)
            return fused_rpe_attention_trainable(
                x, gn_scale, gn_bias, w_qkv, b_qkv, w_proj, b_proj,
                r_k=r_k, r_q=r_q, r_v=r_v, mask_bias=mask_bias,
                num_heads=H,
                in_transposed=self.transposed_io,
                out_transposed=self.transposed_io,
            )

        # ---- reference einsum path (differentiable) ---------------------- #
        if self.transposed_io:
            x = x.transpose(0, 2, 1, 3)  # (B, T, D, C) -> (B, D, T, C)
        # pre-norm pooling stats over (T, group-channels) per (b, d)
        xf = x.astype(jnp.float32).reshape(B, D, T, 32, C // 32)
        mean = xf.mean(axis=(2, 4), keepdims=True)
        var = xf.var(axis=(2, 4), keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(B, D, T, C)
        x = (xn * gn_scale + gn_bias).astype(x.dtype)

        # q/k/v stay in the (B, D, T, H, F) layout the qkv matmul produces —
        # einsum subscripts absorb the head/token reordering so no transposed
        # copies of the big activations ever hit HBM
        xc = x.astype(self.dtype)
        # Split q/k/v by slicing the LANE axis (minor dim stays 3C, fully
        # tiled) rather than reshaping to (B, D, T, 3, H, F): that 6-D shape
        # puts (H, F) = (4, 32) in the minor dims, which the TPU pads ~6x —
        # the bf16[608,256,10,3,4,32] 7.1G buffer that OOM'd the folded-
        # window independent sampler at batch 32 (NOTES_ROUND4.md). The
        # (H, F) head split now happens per-operand where XLA can fuse it
        # into the consuming einsum instead of materializing it.
        qkv = xc @ w_qkv.astype(self.dtype) + b_qkv.astype(self.dtype)
        q = (qkv[..., :C] * scale).reshape(B, D, T, H, F)
        k = qkv[..., C : 2 * C].reshape(B, D, T, H, F)
        v = qkv[..., 2 * C :].reshape(B, D, T, H, F)

        attn_probe = None
        if _use_dminor_layout(T, D, train):
            # d-minor variant: same contractions with the pixel axis D kept
            # minor, so q/k/v (B,H,T,F,D) and scores (B,H,i,j,D) stay dense
            # on TPU tiles (see _use_dminor_layout / qkv_layout_probe.json).
            qd = q.transpose(0, 3, 2, 4, 1)
            kd = k.transpose(0, 3, 2, 4, 1)
            vd = v.transpose(0, 3, 2, 4, 1)
            # multiply+reduce instead of dot_general: XLA's dot layout
            # assignment would otherwise transpose the operands back to
            # f-minor (padded) form — einsum here compiles to the exact
            # same buffers as the standard branch. The contraction is tiny
            # (F <= 32 per head) and these dots run at ~2% MXU utilization,
            # so a fused VPU reduce over dense d-minor operands wins.
            attn = (
                (qd[:, :, :, None] * kd[:, :, None])
                .sum(axis=4, dtype=jnp.float32)  # f32 accum like the MXU dot
                .astype(qd.dtype)
            )
            if self.use_rpe_k:
                attn = attn + self._make_rpe("rpe_k")(
                    qd, pairwise_distances, temb, "qk_dminor"
                )
            if self.use_rpe_q:
                attn = attn + jnp.swapaxes(
                    self._make_rpe("rpe_q")(
                        kd * scale, pairwise_distances, temb, "qk_dminor"
                    ),
                    2,
                    3,
                )
            if mask_bias is not None:
                attn = attn.astype(jnp.float32) + mask_bias[:, None, :, :, None]
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=3).astype(
                x.dtype
            )
            out = (
                (attn[:, :, :, :, None] * vd[:, :, None])
                .sum(axis=3, dtype=jnp.float32)
                .astype(vd.dtype)
            )
            if self.use_rpe_v:
                out = out + self._make_rpe("rpe_v")(
                    attn, pairwise_distances, temb, "v_dminor"
                )
            out = out.transpose(0, 4, 2, 1, 3).reshape(B, D, T, C)
            if capture_attn:
                attn_probe = jnp.abs(attn.astype(jnp.float32)).mean(axis=(1, 4))
        else:
            attn = jnp.einsum("bdihf,bdjhf->bdhij", q, k)

            if self.use_rpe_k:
                attn = attn + self._make_rpe("rpe_k")(
                    q, pairwise_distances, temb, "qk"
                )
            if self.use_rpe_q:
                attn = attn + jnp.swapaxes(
                    self._make_rpe("rpe_q")(
                        k * scale, pairwise_distances, temb, "qk"
                    ),
                    -1,
                    -2,
                )

            if mask_bias is not None:
                attn = attn.astype(jnp.float32) + mask_bias[:, None, None, :, :]

            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                x.dtype
            )

            out = jnp.einsum("bdhij,bdjhf->bdihf", attn, v)
            if self.use_rpe_v:
                out = out + self._make_rpe("rpe_v")(
                    attn, pairwise_distances, temb, "v"
                )

            out = out.reshape(B, D, T, C)
            if capture_attn:
                attn_probe = jnp.abs(attn.astype(jnp.float32)).mean(axis=(1, 2))
        out = out @ w_proj.astype(out.dtype) + b_proj.astype(out.dtype)
        x = x + out
        if capture_attn:
            # mean over non-attended axis and heads, abs — what the reference
            # logs for visualisation (unet.py:464-468, train_util.py:727-754)
            self.sow("intermediates", "attn", attn_probe)
        if self.transposed_io:
            x = x.transpose(0, 2, 1, 3)  # back to (B, T, D, C)
        return x


class FactorizedAttentionBlock(nn.Module):
    """Temporal attention over frames per pixel, then spatial attention over
    pixels per frame (reference unet.py:202-268, CSDI-style factorization)."""

    channels: int
    num_heads: int
    use_rpe_net: bool = False
    bucket_params: Optional[dict] = None
    allow_interactions_between_padding: bool = False
    use_pallas: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x,  # (B, T, H, W, C)
        temb,  # (B, T, E)
        frame_indices,  # (B, T)
        attn_mask,  # (B, T) or None
        capture_attn=False,
        train=False,
    ):
        B, T, Hh, Ww, C = x.shape
        use_rpe = self.use_rpe_net or (self.bucket_params is not None)
        # temporal: tokens = T, batch = B x (H*W). With fused transposed io
        # the (B, T, HW, C) activation feeds the kernel directly and the
        # temporal<->spatial transpose happens inside its VMEM tile.
        # VDT_PALLAS_ATTN_TEMPORAL (default auto) routes temporal attention
        # to the XLA einsum path where the d-minor layout applies — measured
        # faster than the fused kernel there (bench_ab_r4.json); spatial
        # attention stays on the fused kernel. See _pallas_temporal_enabled.
        temporal_pallas = self.use_pallas and _pallas_temporal_enabled(
            T, Hh * Ww, train
        )
        fuse_transpose = (
            temporal_pallas
            and os.environ.get("VDT_ATTN_FUSE_TRANSPOSE", "1") == "1"
        )
        temporal = RPEAttention(
            channels=C,
            num_heads=self.num_heads,
            use_rpe_q=use_rpe,
            use_rpe_k=use_rpe,
            use_rpe_v=use_rpe,
            use_rpe_net=self.use_rpe_net,
            bucket_params=self.bucket_params,
            allow_interactions_between_padding=self.allow_interactions_between_padding,
            use_pallas=temporal_pallas,
            transposed_io=fuse_transpose,
            dtype=self.dtype,
            name="temporal_attention",
        )
        if fuse_transpose:
            x = temporal(
                x.reshape(B, T, Hh * Ww, C), temb=temb,
                frame_indices=frame_indices, attn_mask=attn_mask,
                capture_attn=capture_attn, train=train,
            )  # (B, T, HW, C) in and out
        else:
            xt = x.reshape(B, T, Hh * Ww, C).transpose(0, 2, 1, 3)
            xt = temporal(
                xt, temb=temb, frame_indices=frame_indices,
                attn_mask=attn_mask, capture_attn=capture_attn, train=train,
            )
            x = xt.transpose(0, 2, 1, 3)  # (B, T, HW, C)
        # spatial: tokens = H*W, batch = B x T; no RPE, no mask
        x = RPEAttention(
            channels=C,
            num_heads=self.num_heads,
            use_pallas=self.use_pallas
            and os.environ.get("VDT_PALLAS_ATTN_SPATIAL", "1") == "1",
            dtype=self.dtype,
            name="spatial_attention",
        )(x, capture_attn=capture_attn, train=train)
        return x.reshape(B, T, Hh, Ww, C)


class UNet(nn.Module):
    """The full U-Net over (B, T, H, W, C) video tensors with per-frame
    timesteps (reference unet.py:543-876 + the UNetVideoModel flattening of
    unet.py:879-926; an image model is the T=1 special case).

    ``timesteps`` are model-facing (already respacing-remapped / rescaled by
    the caller) and per-frame: (B, T) float or int.
    """

    in_channels: int
    model_channels: int
    out_channels: int
    num_res_blocks: int
    attention_resolutions: Tuple[int, ...]
    dropout: float = 0.0
    channel_mult: Sequence[int] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    use_spatial_encoding: bool = False
    image_size: Optional[int] = None
    use_rpe_net: bool = False
    bucket_params: Optional[dict] = None
    allow_interactions_between_padding: bool = False
    # video options (UNetVideoModel)
    video_T: int = 1
    use_frame_encoding: bool = False
    cross_frame_attention: bool = True
    enforce_position_invariance: bool = False
    use_checkpoint: bool = False
    use_pallas_attention: bool = False
    use_pallas_gn: bool = False  # fused GroupNorm+SiLU in ResBlocks (inference)
    dtype: jnp.dtype = jnp.float32
    # keep the output head (out_norm input / out_conv) at the compute dtype
    # instead of f32. The reference upcasts the head to fp32
    # (unet.py:296-302) because fp16 training needs it; at bf16 *inference*
    # the upcast costs a full-resolution model_channels-wide f32
    # write + read per diffusion step (the largest stream in the sampler's
    # "loop fusion" HBM share, BENCH.md profile) for no accuracy the
    # sampler can use. GroupNorm stats stay f32 internally either way.
    # Opt-in (VDT_BF16_TAIL=1 at model construction, see factory.py);
    # training paths never set it.
    bf16_tail: bool = False

    def _first_attn_position(self):
        """(block_index, ds, ch) of the first attention block: positional
        encodings are added right before it runs (reference unet.py:615-667)."""
        n_blocks = 1  # initial conv
        ch = self.model_channels
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for _ in range(self.num_res_blocks):
                if ds in self.attention_resolutions:
                    return n_blocks, ds, ch
                ch = mult * self.model_channels
                n_blocks += 1
            if level != len(self.channel_mult) - 1:
                n_blocks += 1
                ds *= 2
        return n_blocks, ds, ch

    @nn.compact
    def __call__(
        self,
        x,  # (B, T, H, W, C_in)
        timesteps,  # (B, T)
        *,
        y=None,
        frame_indices=None,  # (B, T)
        attn_mask=None,  # (B, T)
        train: bool = False,
        capture_attn: bool = False,
        capture_features: bool = False,
    ):
        B, T, Hh, Ww, Cin = x.shape
        assert (y is not None) == (self.num_classes is not None)
        if frame_indices is None:
            frame_indices = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
        attn_T = T if self.cross_frame_attention else 1

        emb = timestep_embedding(timesteps.reshape(B * T), self.model_channels)
        emb = nn.Dense(self.model_channels * 4, dtype=self.dtype, name="time_embed_1")(
            emb.astype(self.dtype)
        )
        emb = nn.Dense(self.model_channels * 4, dtype=self.dtype, name="time_embed_2")(
            nn.silu(emb)
        )
        if self.num_classes is not None:
            label_emb = nn.Embed(
                self.num_classes, self.model_channels * 4, dtype=self.dtype,
                name="label_emb",
            )(y)  # (B, E)
            emb = emb + jnp.repeat(label_emb, T, axis=0)

        # per-frame temb for RPENet, shaped for the attention batch layout
        temb_bt = emb.reshape(B, T, -1)
        if not self.cross_frame_attention:
            temb_bt = emb.reshape(B * T, 1, -1)

        # rematerialization: recompute block activations in the backward pass
        # (the TPU counterpart of the reference's CheckpointFunction,
        # nn.py:125-172). Bool args are static.
        resblock = (
            nn.remat(ResBlock, static_argnums=(3,))
            if self.use_checkpoint
            else ResBlock
        )
        attnblock = (
            nn.remat(FactorizedAttentionBlock, static_argnums=(5, 6))
            if self.use_checkpoint
            else FactorizedAttentionBlock
        )

        def make_res(out_ch, name):
            return resblock(
                out_channels=out_ch,
                dropout=self.dropout,
                use_scale_shift_norm=self.use_scale_shift_norm,
                use_pallas=self.use_pallas_gn,
                dtype=self.dtype,
                name=name,
            )

        def make_attn(ch, name):
            return attnblock(
                channels=ch,
                num_heads=self.num_heads,
                use_rpe_net=self.use_rpe_net,
                bucket_params=self.bucket_params,
                allow_interactions_between_padding=self.allow_interactions_between_padding,
                use_pallas=self.use_pallas_attention,
                dtype=self.dtype,
                name=name,
            )

        def apply_attn(block, h):
            # h: (B*T, H', W', C) -> attention in (B, T, ...) layout
            n, hh, ww, c = h.shape
            hv = h.reshape(-1, attn_T, hh, ww, c)
            hv = block(hv, temb_bt, self._fi(frame_indices, B, T), self._am(attn_mask, B, T), capture_attn, train)
            return hv.reshape(n, hh, ww, c)

        n_before_attn, first_attn_ds, first_attn_ch = self._first_attn_position()

        h = x.reshape(B * T, Hh, Ww, Cin).astype(self.dtype)
        hs = []
        block_idx = 0

        def sow_feature(stage, value):
            # feature-vector capture (reference get_feature_vectors,
            # unet.py:846-876): read back via mutable=['intermediates']
            if capture_features:
                self.sow("intermediates", f"features_{stage}", value)

        # --- input blocks -------------------------------------------------
        h = _conv(self.model_channels, 3, dtype=self.dtype, name="in_conv")(h)
        hs.append(h)
        block_idx += 1
        if block_idx == n_before_attn:
            h = self._add_positional_encodings(h, frame_indices, first_attn_ch)

        ch = self.model_channels
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            for i in range(self.num_res_blocks):
                h = make_res(mult * self.model_channels, f"down_{level}_{i}_res")(
                    # positional: remat declares train static by argnum
                    h, emb, train
                )
                ch = mult * self.model_channels
                if ds in self.attention_resolutions:
                    h = apply_attn(make_attn(ch, f"down_{level}_{i}_attn"), h)
                hs.append(h)
                sow_feature("down", h)
                block_idx += 1
                if block_idx == n_before_attn:
                    h = self._add_positional_encodings(
                        h, frame_indices, first_attn_ch
                    )
            if level != len(self.channel_mult) - 1:
                h = Downsample(
                    ch, self.conv_resample, dtype=self.dtype, name=f"down_{level}_ds"
                )(h)
                hs.append(h)
                block_idx += 1
                if block_idx == n_before_attn:
                    h = self._add_positional_encodings(
                        h, frame_indices, first_attn_ch
                    )
                ds *= 2

        # --- middle --------------------------------------------------------
        h = make_res(ch, "mid_res1")(h, emb, train)
        h = apply_attn(make_attn(ch, "mid_attn"), h)
        h = make_res(ch, "mid_res2")(h, emb, train)
        sow_feature("middle", h)

        # --- output blocks ---------------------------------------------------
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = make_res(self.model_channels * mult, f"up_{level}_{i}_res")(
                    h, emb, train
                )
                ch = self.model_channels * mult
                if ds in self.attention_resolutions:
                    h = apply_attn(make_attn(ch, f"up_{level}_{i}_attn"), h)
                if level and i == self.num_res_blocks:
                    h = Upsample(
                        ch, self.conv_resample, dtype=self.dtype, name=f"up_{level}_us"
                    )(h)
                    ds //= 2
                sow_feature("up", h)

        if not self.bf16_tail:
            h = h.astype(jnp.float32)
        h = GroupNorm32(act="silu", use_pallas=self.use_pallas_gn, name="out_norm")(h)
        h = _conv(
            self.out_channels, 3, zero=True,
            dtype=self.dtype if self.bf16_tail else jnp.float32,
            name="out_conv",
        )(h)
        return h.reshape(B, T, Hh, Ww, self.out_channels)

    def _fi(self, frame_indices, B, T):
        if self.cross_frame_attention:
            return frame_indices
        return frame_indices.reshape(B * T, 1)

    def _am(self, attn_mask, B, T):
        if attn_mask is None:
            return None
        if self.cross_frame_attention:
            return attn_mask
        return attn_mask.reshape(B * T, 1)

    def _add_positional_encodings(self, h, frame_indices, ch):
        """Learned spatial encoding + sinusoidal frame encoding, added right
        before the first attention block (reference unet.py:669-677, :816-818,
        :914-926)."""
        if self.use_spatial_encoding:
            res = h.shape[1]
            enc = self.param(
                "spatial_encoding",
                nn.initializers.normal(stddev=1.0),
                (1, res, res, ch),
            )
            h = h + enc.astype(h.dtype)
        if self.use_frame_encoding:
            B, T = frame_indices.shape
            fi = frame_indices.astype(jnp.float32)
            if self.enforce_position_invariance:
                fi = fi - fi.mean(axis=1, keepdims=True)
            emb = frame_embedding(fi, h.shape[-1], max_period=self.video_T * 10)
            h = h + emb.reshape(B * T, 1, 1, -1).astype(h.dtype)
        return h


class VideoUNet(nn.Module):
    """Video U-Net without observation conditioning (UNetVideoModel,
    reference unet.py:879-926): per-frame timesteps, frame positional
    encodings, cross-frame attention."""

    config: dict

    @nn.compact
    def __call__(self, x, timesteps, *, frame_indices=None, attn_mask=None,
                 y=None, train=False, capture_attn=False,
                 capture_features=False, **_ignored):
        B, T = x.shape[:2]
        if timesteps.ndim == 1:
            timesteps = jnp.broadcast_to(timesteps[:, None], (B, T))
        return UNet(**self.config, name="unet")(
            x,
            timesteps,
            y=y,
            frame_indices=frame_indices,
            attn_mask=attn_mask,
            train=train,
            capture_attn=capture_attn,
            capture_features=capture_features,
        )


class CondMargVideoUNet(nn.Module):
    """Frame-set conditional video model (CondMargVideoModel, reference
    unet.py:929-1026): splices observed-frame content into x, appends
    obs/kinda-marginal indicator channels, and overrides per-frame timesteps
    for observed slots according to ``observed_frames``:
    x_0 / x_t / x_t_minus_1 / x_random / hybrid_k.
    """

    config: dict
    cond_emb_type: str = "channel"

    @nn.compact
    def __call__(
        self,
        x,  # (B, T, H, W, C)
        timesteps,  # (B,) model-facing
        *,
        x0,
        obs_mask,  # (B, T, 1, 1, 1)
        latent_mask,
        kinda_marg_mask,
        frame_indices,  # (B, T)
        observed_frames="x_0",
        x_t_minus_1=None,
        x_random=None,
        random_t=None,
        hybrid=None,
        train=False,
        capture_attn=False,
        capture_features=False,
    ):
        B, T = x.shape[:2]
        cond_emb_type = self.cond_emb_type.replace("-initzero", "")
        timesteps = jnp.broadcast_to(
            timesteps.reshape(B, 1).astype(jnp.float32), (B, T)
        )
        anything_mask = jnp.clip(obs_mask + latent_mask + kinda_marg_mask, max=1)

        # The spliced input is materialized at the UNet compute dtype. Every
        # output pixel is exactly one of {x, observed_content, 0} scaled by
        # exact 0/1 masks (disjoint by construction, training/masks.py and
        # sampling/sampler.py), so cast-then-splice is bit-identical to the
        # old f32 splice followed by the bf16 cast at in_conv — at half the
        # HBM for the (C+2)-channel tensor, once per diffusion step.
        cd = self.config.get("dtype", jnp.float32)
        xc = x.astype(cd)

        if cond_emb_type == "channel":
            indicator_template = jnp.ones_like(xc[:, :, :, :, :1])
            obs_indicator = indicator_template * obs_mask.astype(cd)
            kinda_marg_indicator = indicator_template * kinda_marg_mask.astype(cd)
            if "hybrid" in observed_frames:
                threshold = int(observed_frames.split("_")[-1])
                fdm = (timesteps < threshold).astype(cd)[:, :, None, None, None]
                observed_content = (
                    x_t_minus_1.astype(cd) * fdm + hybrid.astype(cd) * (1 - fdm)
                )
            else:
                observed_content = {
                    "x_0": x0,
                    "x_t": x,
                    "x_t_minus_1": x_t_minus_1,
                    "x_random": x_random,
                }[observed_frames].astype(cd)
            x_in = jnp.concatenate(
                [
                    xc * latent_mask.astype(cd)
                    + observed_content * obs_mask.astype(cd)
                    + xc * (1 - anything_mask).astype(cd),
                    obs_indicator,
                    kinda_marg_indicator,
                ],
                axis=-1,
            )
            # per-frame timestep overrides for observed slots
            # (reference unet.py:991-1013)
            if "hybrid" in observed_frames:
                threshold = int(observed_frames.split("_")[-1])
                fdm = (timesteps < threshold).astype(jnp.float32)
                timesteps_obs = fdm * (timesteps[:, :1] - 1) + (1 - fdm) * threshold
            else:
                timesteps_obs = {
                    "x_0": lambda: jnp.zeros_like(timesteps[:, :1]),
                    "x_t": lambda: timesteps[:, :1],
                    "x_t_minus_1": lambda: timesteps[:, :1] - 1,
                    "x_random": lambda: random_t.reshape(B, 1).astype(jnp.float32),
                }[observed_frames]()
                timesteps_obs = jnp.broadcast_to(timesteps_obs, (B, T))
            obs_m = obs_mask.reshape(B, T)
            timesteps = timesteps_obs * obs_m + timesteps * (1 - obs_m)
        elif cond_emb_type in ("duplicate", "all"):
            x_in = jnp.concatenate(
                [
                    xc * latent_mask.astype(cd)
                    + xc * (1 - anything_mask).astype(cd),
                    x0.astype(cd) * obs_mask.astype(cd),
                ],
                axis=-1,
            )
        elif cond_emb_type == "t=0":
            x_in = x
            obs_m = obs_mask.reshape(B, T)
            timesteps = jnp.where(obs_m == 1, -1.0, timesteps)
        else:
            raise NotImplementedError(cond_emb_type)

        return UNet(**self.config, name="unet")(
            x_in,
            timesteps,
            frame_indices=frame_indices,
            attn_mask=anything_mask.reshape(B, T),
            train=train,
            capture_attn=capture_attn,
            capture_features=capture_features,
        )


class SuperResUNet(nn.Module):
    """Super-resolution model conditioning on a bilinearly-upsampled low-res
    image concatenated on channels (reference unet.py:1029-1049)."""

    config: dict

    @nn.compact
    def __call__(self, x, timesteps, *, low_res=None, y=None, train=False,
                 capture_attn=False, **_ignored):
        # x: (B, H, W, C) image layout; add T=1 axis internally
        B, H, W, C = x.shape
        upsampled = jax.image.resize(
            low_res, (B, H, W, low_res.shape[-1]), method="bilinear"
        )
        x_in = jnp.concatenate([x, upsampled], axis=-1)
        if timesteps.ndim == 1:
            timesteps = timesteps[:, None]
        out = UNet(**self.config, name="unet")(
            x_in[:, None],
            timesteps,
            y=y,
            train=train,
            capture_attn=capture_attn,
        )
        return out[:, 0]
