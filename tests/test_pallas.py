"""Pallas kernel parity tests (interpreter mode on CPU; the same kernels
compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_tpu.ops.pallas_kernels import (
    group_norm_silu,
    group_norm_silu_reference,
)


@pytest.mark.parametrize("shape", [(2, 8, 8, 64), (3, 5, 32)])
def test_group_norm_silu_parity(shape):
    key = jax.random.PRNGKey(0)
    C = shape[-1]
    x = jax.random.normal(key, shape, dtype=jnp.float32) * 2 + 0.3
    scale = jax.random.normal(jax.random.PRNGKey(1), (C,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.1
    ref = group_norm_silu_reference(x, scale, bias, num_groups=32 if C >= 32 else 8)
    got = group_norm_silu(
        x, scale, bias, num_groups=32 if C >= 32 else 8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_group_norm_silu_bf16():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 64), dtype=jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    ref = group_norm_silu_reference(x, scale, bias)
    got = group_norm_silu(x, scale, bias, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )


def test_fused_rpe_attention_parity_interpret():
    """Fused attention kernel (interpret mode) vs the module's einsum path,
    with RPENet bias + mask, on realistic small shapes."""
    from video_diffusion_tpu.models.unet import RPEAttention
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    B, D, T, C, H = 2, 8, 5, 64, 2
    att = RPEAttention(
        channels=C, num_heads=H, use_rpe_q=True, use_rpe_k=True,
        use_rpe_v=True, use_rpe_net=True,
        allow_interactions_between_padding=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, T, C))
    temb = jax.random.normal(jax.random.PRNGKey(1), (B, T, 32))
    fi = jnp.asarray(np.array([[0, 2, 5, 9, 14], [1, 2, 3, 4, 20]]))
    am = jnp.asarray(np.array([[1, 1, 1, 1, 0], [1, 1, 1, 1, 1]], np.float32))
    v = att.init(jax.random.PRNGKey(2), x, temb, fi, am)
    # perturb zero-init params so the attention output is nontrivial
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(3), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    ref = att.apply(v, x, temb, fi, am)

    p = v["params"]
    # R tensors computed the same way the module does
    pair = fi[:, :, None] - fi[:, None, :]
    rpe = {}
    for nm in ("rpe_k", "rpe_q", "rpe_v"):
        sub = {"params": p[nm]}
        from video_diffusion_tpu.models.unet import RPE

        rpe[nm] = RPE(channels=C, num_heads=H, use_rpe_net=True).apply(
            sub, pair, temb, method="get_R"
        )
    m = am
    allowed = m[:, None, :] * m[:, :, None]
    allowed = allowed + (1 - m[:, None, :]) * (1 - m[:, :, None])
    mask_bias = jnp.where(allowed > 0, 0.0, -jnp.inf)
    got = fused_rpe_attention(
        x, p["norm_scale"], p["norm_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"],
        r_k=rpe["rpe_k"], r_q=rpe["rpe_q"], r_v=rpe["rpe_v"],
        mask_bias=mask_bias, num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_attention_no_rpe_no_mask_parity():
    from video_diffusion_tpu.models.unet import RPEAttention
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    B, D, T, C, H = 1, 4, 16, 64, 4
    att = RPEAttention(channels=C, num_heads=H)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, D, T, C))
    v = att.init(jax.random.PRNGKey(6), x)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    ref = att.apply(v, x)
    p = v["params"]
    got = fused_rpe_attention(
        x, p["norm_scale"], p["norm_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"], num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_attention_dot_bf16_parity():
    """VDT_ATTN_DOT_BF16 narrows the score/value dot *operands* to bf16 with
    f32 accumulation; the result must match the f32-operand kernel to bf16
    tolerance (relative ~1e-2 on O(1) activations)."""
    from video_diffusion_tpu.models.unet import RPEAttention
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    B, D, T, C, H = 1, 4, 16, 64, 4
    att = RPEAttention(channels=C, num_heads=H)
    x = jax.random.normal(jax.random.PRNGKey(5), (B, D, T, C))
    v = att.init(jax.random.PRNGKey(6), x)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    ref = att.apply(v, x)
    p = v["params"]
    args = (
        x, p["norm_scale"], p["norm_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"],
    )
    base = fused_rpe_attention(*args, num_heads=H, interpret=True)
    got = fused_rpe_attention(
        *args, num_heads=H, interpret=True, dot_bf16=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-2, rtol=2e-2
    )
    # and the default stays exact vs the einsum path
    np.testing.assert_allclose(np.asarray(base), np.asarray(ref), atol=3e-5)


def test_group_norm_silu_mod_parity():
    """Per-sample FiLM modulation path (ResBlock scale-shift norm)."""
    N, S, C = 3, 16, 64
    x = jax.random.normal(jax.random.PRNGKey(10), (N, S, C)) * 1.5
    scale = jax.random.normal(jax.random.PRNGKey(11), (C,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(12), (C,)) * 0.1
    ms = jax.random.normal(jax.random.PRNGKey(13), (N, C)) * 0.2
    mb = jax.random.normal(jax.random.PRNGKey(14), (N, C)) * 0.2
    ref = group_norm_silu_reference(x, scale, bias, ms, mb)
    got = group_norm_silu(x, scale, bias, ms, mb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_groupnorm32_param_tree_matches_fused_path():
    """The fused path's param holder (_GNParams) declares exactly the tree
    flax's nn.GroupNorm declares, so either execution path loads the other's
    checkpoints."""
    from flax import linen as nn

    from video_diffusion_tpu.models.nn import GroupNorm32, _GNParams

    class _Holder(nn.Module):
        @nn.compact
        def __call__(self, x):
            scale, bias = _GNParams(x.shape[-1], name="GroupNorm_0")()
            return x * scale + bias

    x = jnp.ones((2, 4, 64))
    v1 = GroupNorm32().init(jax.random.PRNGKey(0), x)
    v2 = _Holder().init(jax.random.PRNGKey(0), x)
    s1 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v1)
    s2 = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v2)
    assert s1 == s2


def test_resblock_fused_gn_parity(monkeypatch):
    """ResBlock with use_pallas=True (fused GN+SiLU, interpret mode) matches
    the plain path on the same params, for both scale-shift modes."""
    import video_diffusion_tpu.ops.pallas_kernels as pk
    from video_diffusion_tpu.models import nn as vnn
    from video_diffusion_tpu.models.unet import ResBlock
    import functools as ft

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(
        pk, "group_norm_silu", ft.partial(pk.group_norm_silu, interpret=True)
    )

    x = jax.random.normal(jax.random.PRNGKey(20), (2, 8, 8, 64))
    emb = jax.random.normal(jax.random.PRNGKey(21), (2, 128))
    for ssn in (False, True):
        plain = ResBlock(out_channels=64, use_scale_shift_norm=ssn)
        fused = ResBlock(out_channels=64, use_scale_shift_norm=ssn,
                         use_pallas=True)
        v = plain.init(jax.random.PRNGKey(22), x, emb)
        leaves, treedef = jax.tree_util.tree_flatten(v)
        keys = jax.random.split(jax.random.PRNGKey(23), len(leaves))
        v = jax.tree_util.tree_unflatten(
            treedef,
            [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
             for p, k in zip(leaves, keys)],
        )
        ref = plain.apply(v, x, emb)
        got = fused.apply(v, x, emb)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=1e-4,
            err_msg=f"use_scale_shift_norm={ssn}",
        )


def test_group_norm_silu_tiled_parity():
    """Large-S inputs take the two-phase S-tiled kernel path."""
    from video_diffusion_tpu.ops.pallas_kernels import _GN_SINGLE_BLOCK_ELEMS

    N, S, C = 2, 8192, 128
    assert S * C > _GN_SINGLE_BLOCK_ELEMS  # must exercise the tiled path
    x = jax.random.normal(jax.random.PRNGKey(30), (N, S, C)) * 1.3 + 0.2
    scale = jax.random.normal(jax.random.PRNGKey(31), (C,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(32), (C,)) * 0.1
    ms = jax.random.normal(jax.random.PRNGKey(33), (N, C)) * 0.2
    mb = jax.random.normal(jax.random.PRNGKey(34), (N, C)) * 0.2
    for args in ((None, None), (ms, mb)):
        ref = group_norm_silu_reference(x, scale, bias, *args)
        got = group_norm_silu(x, scale, bias, *args, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=3e-5)


def test_fused_attention_padded_heads_parity():
    """F=96 (C=384, H=4 — the flagship's misaligned head width) exercises
    the 128-lane head-padding weight transform; must stay numerically exact
    vs the einsum path."""
    from video_diffusion_tpu.models.unet import RPE, RPEAttention
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    B, D, T, C, H = 1, 4, 5, 384, 4  # F = 96
    att = RPEAttention(
        channels=C, num_heads=H, use_rpe_q=True, use_rpe_k=True,
        use_rpe_v=True, use_rpe_net=True,
        allow_interactions_between_padding=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(10), (B, D, T, C))
    temb = jax.random.normal(jax.random.PRNGKey(11), (B, T, 32))
    fi = jnp.asarray(np.array([[0, 3, 6, 9, 12]]))
    am = jnp.asarray(np.array([[1, 1, 1, 1, 0]], np.float32))
    v = att.init(jax.random.PRNGKey(12), x, temb, fi, am)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(13), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    ref = att.apply(v, x, temb, fi, am)
    p = v["params"]
    pair = fi[:, :, None] - fi[:, None, :]
    rpe = {
        nm: RPE(channels=C, num_heads=H, use_rpe_net=True).apply(
            {"params": p[nm]}, pair, temb, method="get_R"
        )
        for nm in ("rpe_k", "rpe_q", "rpe_v")
    }
    m = am
    allowed = m[:, None, :] * m[:, :, None]
    allowed = allowed + (1 - m[:, None, :]) * (1 - m[:, :, None])
    mask_bias = jnp.where(allowed > 0, 0.0, -jnp.inf)
    got = fused_rpe_attention(
        x, p["norm_scale"], p["norm_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"],
        r_k=rpe["rpe_k"], r_q=rpe["rpe_q"], r_v=rpe["rpe_v"],
        mask_bias=mask_bias, num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_fused_attention_transposed_io_parity():
    """in_transposed/out_transposed kernel layout must equal the natural
    layout result transposed (the factorized-attention fuse-transpose path)."""
    from video_diffusion_tpu.models.unet import RPEAttention
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    B, D, T, C, H = 1, 8, 5, 64, 2
    att = RPEAttention(channels=C, num_heads=H)
    x = jax.random.normal(jax.random.PRNGKey(20), (B, D, T, C))
    v = att.init(jax.random.PRNGKey(21), x)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(22), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    p = v["params"]
    args = (p["norm_scale"], p["norm_bias"], p["qkv_kernel"], p["qkv_bias"],
            p["proj_kernel"], p["proj_bias"])
    base = fused_rpe_attention(x, *args, num_heads=H, interpret=True)
    xt = x.transpose(0, 2, 1, 3)  # (B, T, D, C)
    got = fused_rpe_attention(
        xt, *args, num_heads=H, interpret=True,
        in_transposed=True, out_transposed=True,
    )
    assert got.shape == (B, T, D, C)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base).transpose(0, 2, 1, 3), atol=1e-6
    )


def test_factorized_block_fuse_transpose_einsum_equivalence(monkeypatch):
    """On CPU the pallas path is skipped, so VDT_ATTN_FUSE_TRANSPOSE must be
    a pure layout change: FactorizedAttentionBlock output identical with the
    flag on and off (einsum fallback handles transposed_io itself)."""
    from video_diffusion_tpu.models.unet import FactorizedAttentionBlock

    B, T, Hh, Ww, C = 1, 4, 4, 4, 64
    x = jax.random.normal(jax.random.PRNGKey(30), (B, T, Hh, Ww, C))
    temb = jax.random.normal(jax.random.PRNGKey(31), (B, T, 32))
    fi = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    am = jnp.ones((B, T), jnp.float32)

    def run(flag):
        monkeypatch.setenv("VDT_ATTN_FUSE_TRANSPOSE", flag)
        blk = FactorizedAttentionBlock(
            channels=C, num_heads=2, use_rpe_net=True, use_pallas=True
        )
        v = blk.init(jax.random.PRNGKey(32), x, temb, fi, am)
        leaves, treedef = jax.tree_util.tree_flatten(v)
        keys = jax.random.split(jax.random.PRNGKey(33), len(leaves))
        v = jax.tree_util.tree_unflatten(
            treedef,
            [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
             for p, k in zip(leaves, keys)],
        )
        return np.asarray(blk.apply(v, x, temb, fi, am))

    np.testing.assert_allclose(run("0"), run("1"), atol=1e-6)


def test_trainable_attention_gradients():
    """fused_rpe_attention_trainable: kernel forward (interpret) + einsum
    backward must match jax.grad of the module's einsum path on every
    parameter and the input."""
    from video_diffusion_tpu.models.unet import RPE, RPEAttention
    from video_diffusion_tpu.ops.fused_attention import (
        fused_rpe_attention_trainable,
    )

    B, D, T, C, H = 1, 4, 5, 64, 2
    att = RPEAttention(
        channels=C, num_heads=H, use_rpe_q=True, use_rpe_k=True,
        use_rpe_v=True, use_rpe_net=True,
        allow_interactions_between_padding=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(40), (B, D, T, C))
    temb = jax.random.normal(jax.random.PRNGKey(41), (B, T, 32))
    fi = jnp.asarray(np.array([[0, 2, 4, 8, 16]]))
    am = jnp.ones((B, T), jnp.float32)
    v = att.init(jax.random.PRNGKey(42), x, temb, fi, am)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(43), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )

    def loss_module(variables, xx):
        return (att.apply(variables, xx, temb, fi, am) ** 2).sum()

    g_ref_v, g_ref_x = jax.grad(loss_module, argnums=(0, 1))(v, x)

    p = v["params"]
    pair = fi[:, :, None] - fi[:, None, :]

    def loss_fused(params, xx):
        rpe = {
            nm: RPE(channels=C, num_heads=H, use_rpe_net=True).apply(
                {"params": params[nm]}, pair, temb, method="get_R"
            )
            for nm in ("rpe_k", "rpe_q", "rpe_v")
        }
        m = am
        allowed = m[:, None, :] * m[:, :, None]
        allowed = allowed + (1 - m[:, None, :]) * (1 - m[:, :, None])
        mask_bias = jnp.where(allowed > 0, 0.0, -jnp.inf)
        out = fused_rpe_attention_trainable(
            xx, params["norm_scale"], params["norm_bias"],
            params["qkv_kernel"], params["qkv_bias"],
            params["proj_kernel"], params["proj_bias"],
            r_k=rpe["rpe_k"], r_q=rpe["rpe_q"], r_v=rpe["rpe_v"],
            mask_bias=mask_bias, num_heads=H, interpret=True,
        )
        return (out ** 2).sum()

    g_fused_p, g_fused_x = jax.grad(loss_fused, argnums=(0, 1))(p, x)

    np.testing.assert_allclose(
        np.asarray(g_fused_x), np.asarray(g_ref_x), rtol=2e-3, atol=2e-3
    )
    ref_p = g_ref_v["params"]
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_p)
    flat_fused = dict(jax.tree_util.tree_leaves_with_path(g_fused_p))
    checked = 0
    for path, leaf in flat_ref:
        got = flat_fused[path]
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(leaf), rtol=2e-3, atol=2e-3,
            err_msg=str(path),
        )
        checked += 1
    assert checked >= 8  # gn scale/bias, qkv, proj, 3x RPENet subtrees


@pytest.mark.parametrize("dense", ["0", "1"])
def test_fused_attention_dense_head_packing_parity(monkeypatch, dense):
    """The head-packed ("dense group") attention section must be numerically
    identical to the per-head loop variant and the einsum path: off-diagonal
    head blocks are -1e9-masked so the full-width softmax underflows to
    EXACT zeros off-block (see kernel comment). Covers RPE + attn-mask and
    the padded-head F=96 flagship config."""
    from video_diffusion_tpu.models.unet import RPE, RPEAttention
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    monkeypatch.setenv("VDT_ATTN_DENSE", dense)
    B, D, T, C, H = 1, 4, 5, 384, 4  # F = 96 -> padded 128
    att = RPEAttention(
        channels=C, num_heads=H, use_rpe_q=True, use_rpe_k=True,
        use_rpe_v=True, use_rpe_net=True,
        allow_interactions_between_padding=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(60), (B, D, T, C))
    temb = jax.random.normal(jax.random.PRNGKey(61), (B, T, 32))
    fi = jnp.asarray(np.array([[0, 3, 6, 9, 12]]))
    am = jnp.asarray(np.array([[1, 1, 1, 1, 0]], np.float32))
    v = att.init(jax.random.PRNGKey(62), x, temb, fi, am)
    leaves, treedef = jax.tree_util.tree_flatten(v)
    keys = jax.random.split(jax.random.PRNGKey(63), len(leaves))
    v = jax.tree_util.tree_unflatten(
        treedef,
        [p + 0.05 * jax.random.normal(k, p.shape, p.dtype)
         for p, k in zip(leaves, keys)],
    )
    ref = att.apply(v, x, temb, fi, am)
    p = v["params"]
    pair = fi[:, :, None] - fi[:, None, :]
    rpe = {
        nm: RPE(channels=C, num_heads=H, use_rpe_net=True).apply(
            {"params": p[nm]}, pair, temb, method="get_R"
        )
        for nm in ("rpe_k", "rpe_q", "rpe_v")
    }
    m = am
    allowed = m[:, None, :] * m[:, :, None]
    allowed = allowed + (1 - m[:, None, :]) * (1 - m[:, :, None])
    mask_bias = jnp.where(allowed > 0, 0.0, -jnp.inf)
    got = fused_rpe_attention(
        x, p["norm_scale"], p["norm_bias"], p["qkv_kernel"], p["qkv_bias"],
        p["proj_kernel"], p["proj_bias"],
        r_k=rpe["rpe_k"], r_q=rpe["rpe_q"], r_v=rpe["rpe_v"],
        mask_bias=mask_bias, num_heads=H, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-5)


def test_dense_auto_gate_small_heads(monkeypatch):
    """Heads with F < 64 must auto-fall back to the loop variant: the packed
    layout needs 128-aligned lane slices, which small unpadded heads never
    get — Mosaic rejects the concat on real TPUs (offset mismatch) even
    though interpret mode accepts it."""
    import video_diffusion_tpu.ops.fused_attention as fa

    monkeypatch.setenv("VDT_ATTN_DENSE", "auto")
    seen = {}
    orig = fa._fused_rpe_attention_impl

    def spy(*a, **k):
        seen["dense"] = k.get("dense")
        return orig(*a, **k)

    monkeypatch.setattr(fa, "_fused_rpe_attention_impl", spy)
    B, D, T, C, H = 1, 4, 5, 128, 4  # F = 32
    x = jax.random.normal(jax.random.PRNGKey(70), (B, D, T, C))
    fa.fused_rpe_attention(
        x, jnp.ones((C,)), jnp.zeros((C,)),
        jax.random.normal(jax.random.PRNGKey(71), (C, 3 * C)) * 0.05,
        jnp.zeros((3 * C,)),
        jax.random.normal(jax.random.PRNGKey(72), (C, C)) * 0.05,
        jnp.zeros((C,)),
        num_heads=H, interpret=True,
    )
    assert seen["dense"] is False
    # but H*T <= 128 with wide heads still packs
    C2 = 512  # F = 128
    x2 = jax.random.normal(jax.random.PRNGKey(73), (B, D, T, C2))
    fa.fused_rpe_attention(
        x2, jnp.ones((C2,)), jnp.zeros((C2,)),
        jax.random.normal(jax.random.PRNGKey(74), (C2, 3 * C2)) * 0.05,
        jnp.zeros((3 * C2,)),
        jax.random.normal(jax.random.PRNGKey(75), (C2, C2)) * 0.05,
        jnp.zeros((C2,)),
        num_heads=H, interpret=True,
    )
    assert seen["dense"] is True


def test_bf16_softmax_close_not_identical():
    """VDT_ATTN_SOFTMAX=bf16 runs the exp/divide in half precision: outputs
    must stay within bf16-ish tolerance of the f32 kernel (it is an opt-in
    inference speed knob, not a parity mode)."""
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    B, D, T, C, H = 1, 4, 6, 512, 4
    r = jax.random.PRNGKey(80)
    x = jax.random.normal(r, (B, D, T, C))
    wq = jax.random.normal(jax.random.PRNGKey(81), (C, 3 * C)) * 0.05
    wp = jax.random.normal(jax.random.PRNGKey(82), (C, C)) * 0.05
    args = (x, jnp.ones((C,)), jnp.zeros((C,)), wq, jnp.zeros((3 * C,)),
            wp, jnp.zeros((C,)))
    o32 = fused_rpe_attention(
        *args, num_heads=H, interpret=True, softmax_mode="f32"
    )
    o16 = fused_rpe_attention(
        *args, num_heads=H, interpret=True, softmax_mode="bf16"
    )
    np.testing.assert_allclose(
        np.asarray(o16), np.asarray(o32), atol=5e-2, rtol=5e-2
    )


def test_fused_attention_shape_gate():
    """F<64 must never reach the Pallas kernel on real TPU: the loop path at
    F=32 does not finish Mosaic compilation (NOTES_ROUND3.md), and the dense
    layout needs 128-aligned head slices."""
    from video_diffusion_tpu.models.unet import use_fused_attention

    # enabled, no capture, real TPU, wide heads -> kernel
    assert use_fused_attention(True, False, "tpu", 64)
    assert use_fused_attention(True, False, "axon", 96)
    # bouncy-balls shape (C=128, H=4 -> F=32): einsum, even with the knob on
    assert not use_fused_attention(True, False, "tpu", 32)
    assert not use_fused_attention(True, False, "axon", 48)
    # CPU backend never takes the kernel
    assert not use_fused_attention(True, False, "cpu", 64)
    # attention-map capture needs the materialized scores
    assert not use_fused_attention(True, True, "tpu", 64)
    # knob off
    assert not use_fused_attention(False, False, "tpu", 64)
