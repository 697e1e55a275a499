"""I3D (Inflated 3D Inception, Kinetics-400) in Flax — the FVD feature
extractor.

Replaces the reference's TF1 + tfhub 'i3d-kinetics-400' graph
(frechet_video_distance.py:70-133) with an on-TPU Flax network. Weights load
from a pickle produced by ``scripts/convert_i3d_weights.py`` (run once in any
environment that can read the tfhub SavedModel); without weights a fixed-seed
random init is used — FVD values are then self-consistent but not comparable
to published numbers (warned once).

Input: (B, T>=9, 224, 224, 3) in [-1, 1]; output: (B, 400) logits, the
feature layer the reference's FVD uses.
"""

import os
import pickle
import warnings
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

def _default_weights():
    """Repo-level default drop-in location for converted weights."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "weights", "i3d_kinetics400.pkl"
    )
    return path if os.path.exists(path) else ""


_INCEPTION_CFG = {
    # name: (b0, b1a, b1b, b2a, b2b, b3)
    "Mixed_3b": (64, 96, 128, 16, 32, 32),
    "Mixed_3c": (128, 128, 192, 32, 96, 64),
    "Mixed_4b": (192, 96, 208, 16, 48, 64),
    "Mixed_4c": (160, 112, 224, 24, 64, 64),
    "Mixed_4d": (128, 128, 256, 24, 64, 64),
    "Mixed_4e": (112, 144, 288, 32, 64, 64),
    "Mixed_4f": (256, 160, 320, 32, 128, 128),
    "Mixed_5b": (256, 160, 320, 32, 128, 128),
    "Mixed_5c": (384, 192, 384, 48, 128, 128),
}


class Unit3D(nn.Module):
    """conv3d (no bias) + folded batch-norm + relu — the I3D building block."""

    features: int
    kernel: Sequence[int] = (1, 1, 1)
    strides: Sequence[int] = (1, 1, 1)
    use_relu: bool = True
    use_bn: bool = True
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            tuple(self.kernel),
            strides=tuple(self.strides),
            padding="SAME",
            use_bias=self.use_bias,
            name="conv_3d",
        )(x)
        if self.use_bn:
            # inference-only: scale=False like the original (beta only),
            # running stats folded in by the converter
            x = nn.BatchNorm(
                use_running_average=True, use_scale=False, use_bias=True,
                epsilon=1e-3, name="batch_norm",
            )(x)
        if self.use_relu:
            x = nn.relu(x)
        return x


def _maxpool3d(x, window, strides):
    return nn.max_pool(x, window, strides=strides, padding="SAME")


class InceptionBlock3D(nn.Module):
    b0: int
    b1a: int
    b1b: int
    b2a: int
    b2b: int
    b3: int

    @nn.compact
    def __call__(self, x):
        br0 = Unit3D(self.b0, name="Branch_0/Conv3d_0a_1x1")(x)
        br1 = Unit3D(self.b1a, name="Branch_1/Conv3d_0a_1x1")(x)
        br1 = Unit3D(self.b1b, (3, 3, 3), name="Branch_1/Conv3d_0b_3x3")(br1)
        br2 = Unit3D(self.b2a, name="Branch_2/Conv3d_0a_1x1")(x)
        br2 = Unit3D(self.b2b, (3, 3, 3), name="Branch_2/Conv3d_0b_3x3")(br2)
        br3 = _maxpool3d(x, (3, 3, 3), (1, 1, 1))
        br3 = Unit3D(self.b3, name="Branch_3/Conv3d_0b_1x1")(br3)
        return jnp.concatenate([br0, br1, br2, br3], axis=-1)


class I3D(nn.Module):
    """Full I3D; returns 400-d averaged logits."""

    num_classes: int = 400

    @nn.compact
    def __call__(self, x):
        # x: (B, T, H, W, C)
        x = Unit3D(64, (7, 7, 7), (2, 2, 2), name="Conv3d_1a_7x7")(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2))
        x = Unit3D(64, name="Conv3d_2b_1x1")(x)
        x = Unit3D(192, (3, 3, 3), name="Conv3d_2c_3x3")(x)
        x = _maxpool3d(x, (1, 3, 3), (1, 2, 2))
        x = InceptionBlock3D(*_INCEPTION_CFG["Mixed_3b"], name="Mixed_3b")(x)
        x = InceptionBlock3D(*_INCEPTION_CFG["Mixed_3c"], name="Mixed_3c")(x)
        x = _maxpool3d(x, (3, 3, 3), (2, 2, 2))
        for name in ["Mixed_4b", "Mixed_4c", "Mixed_4d", "Mixed_4e", "Mixed_4f"]:
            x = InceptionBlock3D(*_INCEPTION_CFG[name], name=name)(x)
        x = _maxpool3d(x, (2, 2, 2), (2, 2, 2))
        x = InceptionBlock3D(*_INCEPTION_CFG["Mixed_5b"], name="Mixed_5b")(x)
        x = InceptionBlock3D(*_INCEPTION_CFG["Mixed_5c"], name="Mixed_5c")(x)
        # global average over (T', 7, 7) window then 1x1x1 logits conv
        x = nn.avg_pool(
            x, (2, 7, 7), strides=(1, 1, 1), padding="VALID"
        )
        x = Unit3D(
            self.num_classes, use_relu=False, use_bn=False, use_bias=True,
            name="Logits/Conv3d_0c_1x1",
        )(x)
        x = jnp.squeeze(x, axis=(2, 3))  # (B, T', 400)
        return x.mean(axis=1)


class FVDFeatureExtractor:
    """Preprocess + batch I3D features + Fréchet/KID, the counterpart of the
    reference's fvd.FVD handler (frechet_video_distance.py:28-203)."""

    def __init__(self, weights_path=None, seed=0, batch_size=8):
        self.model = I3D()
        self.batch_size = batch_size
        if weights_path is None:
            weights_path = os.environ.get("I3D_WEIGHTS", "") or _default_weights()
        if weights_path and os.path.exists(weights_path):
            with open(weights_path, "rb") as f:
                variables = pickle.load(f)
            self.variables = jax.tree_util.tree_map(jnp.asarray, variables)
            self.pretrained = True
            self.provenance = f"pretrained:{os.path.abspath(weights_path)}"
        else:
            warnings.warn(
                "I3D weights not found — using fixed-seed random features. "
                "FVD values are self-consistent but NOT comparable to "
                "published numbers; run scripts/convert_i3d_weights.py and "
                "set I3D_WEIGHTS=<path>.",
                stacklevel=2,
            )
            dummy = jnp.zeros((1, 9, 224, 224, 3))
            self.variables = self.model.init(jax.random.PRNGKey(seed), dummy)
            self.pretrained = False
            self.provenance = f"random-init:seed{seed}"
        self._apply = jax.jit(lambda v, x: self.model.apply(v, x))

    @staticmethod
    def preprocess(videos, target_resolution=224):
        """uint8 (B, T, H, W, C) or float [-1,1] -> bilinear 224, [-1,1]
        (reference frechet_video_distance.py:38-58)."""
        videos = np.asarray(videos)
        if videos.dtype == np.uint8:
            videos = videos.astype(np.float32) / 255.0 * 2 - 1
        B, T, H, W, C = videos.shape
        if H != target_resolution or W != target_resolution:
            videos = jax.image.resize(
                jnp.asarray(videos),
                (B, T, target_resolution, target_resolution, C),
                method="bilinear",
            )
        return jnp.asarray(videos, jnp.float32)

    def extract_features(self, videos):
        """videos: (B, T, H, W, C); returns (B, 400) numpy features."""
        if videos.shape[1] < 9:
            # the stride-2 temporal pyramid collapses to an empty window and
            # the features silently go non-finite below 9 frames (same
            # constraint as the reference's tfhub i3d-kinetics-400 graph)
            raise ValueError(
                f"I3D needs >= 9 frames, got T={videos.shape[1]} — pass more "
                "frames (e.g. raise --T or lower --obs_length)."
            )
        videos = self.preprocess(videos)
        feats = []
        for i in range(0, len(videos), self.batch_size):
            feats.append(
                np.asarray(self._apply(self.variables, videos[i : i + self.batch_size]))
            )
        return np.concatenate(feats, axis=0)

    def compute_fvd(self, feats_pred, feats_gt):
        from .metrics import frechet_distance

        return frechet_distance(feats_pred, feats_gt)

    def compute_kid(self, feats_pred, feats_gt):
        from .metrics import kid

        return kid(feats_pred, feats_gt)
