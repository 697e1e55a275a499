"""Pretrained-weight conversion parity tests.

Real I3D/LPIPS weights cannot be fetched in this environment (no network, no
lpips/torchvision/tfhub packages), so these tests prove the conversion
*pipeline* end-to-end instead: torch-built reference networks with synthetic
weights are converted through the exact mapping code the converter scripts
use (video_diffusion_tpu.eval.convert) and must match the Flax
implementations numerically. The realistic conversion failure modes —
kernel-layout transposes, SAME-padding semantics, BN statistics placement,
pool ordering — are all exercised.
"""

import pickle

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from video_diffusion_tpu.eval.convert import (  # noqa: E402
    flax_i3d_to_tfhub_names,
    tfhub_i3d_to_flax,
    torch_lpips_to_flax,
)

# ------------------------------------------------------------------ #
# LPIPS: torch cross-implementation
# ------------------------------------------------------------------ #

_ALEX_TORCH_CFG = [
    # (in, out, kernel, stride, pad)
    (3, 64, 11, 4, 2),
    (64, 192, 5, 1, 2),
    (192, 384, 3, 1, 1),
    (384, 256, 3, 1, 1),
    (256, 256, 3, 1, 1),
]
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _torch_lpips_distance(convs, lins, x, y):
    """Independent torch expression of LPIPS(alex): scale inputs, AlexNet
    trunk with maxpools before conv2/conv3, unit-normalize each stage's
    channels, weighted squared diff, spatial mean, sum over stages."""

    def feats(img):
        h = (img - _SHIFT) / _SCALE
        out = []
        for i, conv in enumerate(convs):
            if i in (1, 2):
                h = F.max_pool2d(h, 3, 2)
            h = F.relu(conv(h))
            out.append(h)
        return out

    def unit(f):
        return f / (f.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)

    total = 0.0
    for f1, f2, w in zip(feats(x), feats(y), lins):
        d = (unit(f1) - unit(f2)).pow(2)
        total = total + (d * w.view(1, -1, 1, 1)).sum(dim=1).mean(dim=(1, 2))
    return total


def test_lpips_conversion_parity_with_torch(tmp_path):
    torch.manual_seed(0)
    convs = [
        torch.nn.Conv2d(i, o, k, stride=s, padding=p)
        for i, o, k, s, p in _ALEX_TORCH_CFG
    ]
    # scale down random conv weights so deep activations stay O(1)
    with torch.no_grad():
        for c in convs:
            c.weight.mul_(0.2)
    lins = [torch.rand(o) for _, o, *_ in _ALEX_TORCH_CFG]

    x = torch.rand(2, 3, 64, 64) * 2 - 1
    y = torch.rand(2, 3, 64, 64) * 2 - 1
    with torch.no_grad():
        ref = _torch_lpips_distance(convs, lins, x, y).numpy()

    data = torch_lpips_to_flax(
        [(c.weight.detach().numpy(), c.bias.detach().numpy()) for c in convs],
        [w.numpy() for w in lins],
    )
    wpath = tmp_path / "lpips_alex.pkl"
    with open(wpath, "wb") as f:
        pickle.dump(data, f)

    from video_diffusion_tpu.eval.lpips import LPIPS

    lp = LPIPS(weights_path=str(wpath))
    assert lp.pretrained and lp.provenance.startswith("pretrained:")
    got = lp(
        np.moveaxis(x.numpy(), 1, -1), np.moveaxis(y.numpy(), 1, -1)
    )
    np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


# ------------------------------------------------------------------ #
# I3D: tfhub-name mapping round-trip over the FULL network
# ------------------------------------------------------------------ #


def test_i3d_tfhub_mapping_roundtrip():
    """Emitting tfhub-style variable names from a Flax I3D tree and mapping
    them back through the converter must reproduce the tree exactly (same
    structure, same values) — this pins the name/nesting mapping against the
    real model's parameter inventory."""
    from video_diffusion_tpu.eval.i3d import I3D

    model = I3D()
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 9, 224, 224, 3))
    )
    var_map = flax_i3d_to_tfhub_names(variables)
    assert len(var_map) > 100  # full inventory, not a fragment
    rebuilt = tfhub_i3d_to_flax(var_map)

    flat_a = jax.tree_util.tree_flatten_with_path(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]}
    )[0]
    flat_b = jax.tree_util.tree_flatten_with_path(rebuilt)[0]
    keys_a = [jax.tree_util.keystr(k) for k, _ in flat_a]
    keys_b = [jax.tree_util.keystr(k) for k, _ in flat_b]
    assert sorted(keys_a) == sorted(keys_b)
    vals_b = dict(zip(keys_b, [v for _, v in flat_b]))
    for k, v in zip(keys_a, [v for _, v in flat_a]):
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vals_b[k]), err_msg=k)

    # and the rebuilt tree must actually run through the network
    out = jax.jit(model.apply)(
        jax.tree_util.tree_map(jnp.asarray, rebuilt),
        jnp.zeros((1, 16, 224, 224, 3)),
    )
    assert out.shape == (1, 400)


# ------------------------------------------------------------------ #
# I3D numerics: torch cross-implementation of the building blocks
# ------------------------------------------------------------------ #


def _same_pad_torch(x, kernel, strides, value=0.0):
    """TF/XLA 'SAME' padding for (B, C, T, H, W) torch tensors."""
    pads = []
    for dim, kk, ss in zip(x.shape[2:], kernel, strides):
        out = -(-dim // ss)
        p = max((out - 1) * ss + kk - dim, 0)
        pads.append((p // 2, p - p // 2))
    flat = [v for pair in reversed(pads) for v in pair]
    return F.pad(x, flat, value=value)


def _torch_unit3d(x, kernel_flax, beta, mean, var, strides, relu=True):
    """conv3d(SAME, no bias) + BN(beta only, eps 1e-3) + relu in torch.
    kernel_flax: (kT, kH, kW, I, O)."""
    w = torch.from_numpy(np.transpose(kernel_flax, (4, 3, 0, 1, 2)).copy())
    k = kernel_flax.shape[:3]
    x = _same_pad_torch(x, k, strides)
    x = F.conv3d(x, w, stride=strides)
    x = F.batch_norm(
        x,
        torch.from_numpy(mean),
        torch.from_numpy(var),
        bias=torch.from_numpy(beta),
        training=False,
        eps=1e-3,
    )
    return F.relu(x) if relu else x


def test_i3d_stem_and_inception_parity_with_torch():
    """Flax stem (7x7x7 s2 Unit3D + SAME maxpool) + one inception block vs an
    independent torch forward on identical random weights — catches kernel
    layout, SAME padding, BN-stat placement, and concat-order bugs."""
    from video_diffusion_tpu.eval.i3d import InceptionBlock3D, Unit3D, _maxpool3d
    from flax import linen as nn

    class Stack(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = Unit3D(8, (7, 7, 7), (2, 2, 2), name="stem")(x)
            x = _maxpool3d(x, (1, 3, 3), (1, 2, 2))
            return InceptionBlock3D(4, 4, 8, 2, 4, 4, name="mix")(x)

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(1, 9, 20, 20, 3)).astype(np.float32)

    model = Stack()
    variables = model.init(jax.random.PRNGKey(1), jnp.asarray(x_np))

    # randomize BN stats too (init gives mean 0 / var 1, which would hide
    # mean/var swaps)
    def jitter(tree):
        leaves, treedef = jax.tree_util.tree_flatten(tree)
        out = []
        for i, leaf in enumerate(leaves):
            noise = rng.normal(size=leaf.shape).astype(np.float32) * 0.3
            out.append(np.abs(np.asarray(leaf) + noise) + 0.1)
        return jax.tree_util.tree_unflatten(treedef, out)

    variables = {
        "params": jax.tree_util.tree_map(
            lambda p: np.asarray(p)
            + rng.normal(size=p.shape).astype(np.float32) * 0.2,
            variables["params"],
        ),
        "batch_stats": jitter(variables["batch_stats"]),
    }
    got = model.apply(jax.tree_util.tree_map(jnp.asarray, variables), x_np)

    # torch reference
    p, bs = variables["params"], variables["batch_stats"]

    def unit(x, scope, strides=(1, 1, 1), relu=True):
        return _torch_unit3d(
            x,
            p[scope]["conv_3d"]["kernel"],
            p[scope]["batch_norm"]["bias"],
            bs[scope]["batch_norm"]["mean"],
            bs[scope]["batch_norm"]["var"],
            strides,
            relu,
        )

    xt = torch.from_numpy(np.transpose(x_np, (0, 4, 1, 2, 3)).copy())
    with torch.no_grad():
        h = unit(xt, "stem", strides=(2, 2, 2))
        h = F.max_pool3d(
            _same_pad_torch(h, (1, 3, 3), (1, 2, 2), value=float("-inf")),
            (1, 3, 3),
            (1, 2, 2),
        )
        def unit_mix(x, name):
            return _torch_unit3d(
                x,
                p["mix"][name]["conv_3d"]["kernel"],
                p["mix"][name]["batch_norm"]["bias"],
                bs["mix"][name]["batch_norm"]["mean"],
                bs["mix"][name]["batch_norm"]["var"],
                (1, 1, 1),
            )

        b0 = unit_mix(h, "Branch_0/Conv3d_0a_1x1")
        b1 = unit_mix(h, "Branch_1/Conv3d_0a_1x1")
        b1 = unit_mix(b1, "Branch_1/Conv3d_0b_3x3")
        b2 = unit_mix(h, "Branch_2/Conv3d_0a_1x1")
        b2 = unit_mix(b2, "Branch_2/Conv3d_0b_3x3")
        b3 = F.max_pool3d(
            _same_pad_torch(h, (3, 3, 3), (1, 1, 1), value=float("-inf")),
            (3, 3, 3),
            (1, 1, 1),
        )
        b3 = unit_mix(b3, "Branch_3/Conv3d_0b_1x1")
        ref = torch.cat([b0, b1, b2, b3], dim=1)
    ref_np = np.transpose(ref.numpy(), (0, 2, 3, 4, 1))
    np.testing.assert_allclose(np.asarray(got), ref_np, atol=2e-4, rtol=1e-4)
