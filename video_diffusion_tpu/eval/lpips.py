"""LPIPS perceptual distance (AlexNet backbone) in Flax.

Replaces the `lpips` pip package the reference uses (video_eval.py:228-252,
inference_util.py:15-31). The AlexNet trunk + per-layer linear heads are
implemented here; pretrained weights are loaded from a pickle produced by
``scripts/convert_lpips_weights.py`` (run once in any torch+lpips
environment). Without a weights file, a fixed-seed random init is used — a
valid *relative* perceptual distance for the adaptive strategies' max-min
frame selection, but NOT comparable to published LPIPS numbers (a warning is
emitted once).

Input convention: (B, H, W, 3) channels-last in [-1, 1].
"""

import os
import pickle
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# LPIPS input scaling (Zhang et al. official constants)
_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

def _default_weights():
    """Repo-level default drop-in location for converted weights."""
    path = os.path.join(
        os.path.dirname(__file__), "..", "..", "weights", "lpips_alex.pkl"
    )
    return path if os.path.exists(path) else ""


_ALEX_CFG = [
    # (features, kernel, stride, padding)
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]


class AlexNetFeatures(nn.Module):
    """AlexNet conv trunk; returns the 5 post-ReLU stage outputs."""

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (f, k, s, p) in enumerate(_ALEX_CFG):
            if i in (1, 2):  # maxpool before conv2 and conv3
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(
                f, (k, k), strides=(s, s), padding=((p, p), (p, p)),
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


def _normalize_tensor(x, eps=1e-10):
    norm = jnp.sqrt(jnp.sum(x**2, axis=-1, keepdims=True))
    return x / (norm + eps)


class LPIPS:
    """Callable LPIPS distance / embedder."""

    def __init__(self, weights_path=None, seed=0):
        self.net = AlexNetFeatures()
        if weights_path is None:
            weights_path = os.environ.get("LPIPS_WEIGHTS", "") or _default_weights()
        if weights_path and os.path.exists(weights_path):
            with open(weights_path, "rb") as f:
                data = pickle.load(f)
            self.params = jax.tree_util.tree_map(jnp.asarray, data["alexnet"])
            self.lins = [jnp.asarray(w) for w in data["lins"]]
            self.pretrained = True
            self.provenance = f"pretrained:{os.path.abspath(weights_path)}"
        else:
            warnings.warn(
                "LPIPS weights not found — using fixed-seed random features. "
                "Distances are valid for relative comparisons only; run "
                "scripts/convert_lpips_weights.py for published-comparable "
                "LPIPS. Set LPIPS_WEIGHTS=<path> to a converted pickle.",
                stacklevel=2,
            )
            dummy = jnp.zeros((1, 64, 64, 3))
            self.params = self.net.init(jax.random.PRNGKey(seed), dummy)["params"]
            self.lins = [
                jnp.ones((f,), dtype=jnp.float32) / f for f, *_ in _ALEX_CFG
            ]
            self.pretrained = False
            self.provenance = f"random-init:seed{seed}"

        # Params/lins cross the jit boundary as ARGUMENTS (closure capture
        # would embed them as HLO constants), and the whole distance is one
        # jitted program: the per-layer eager chain this replaces issued
        # ~20 tiny device RPCs per call, each of which can be dropped by the
        # remote-TPU tunnel (observed: video_eval hung >25 min at LPIPS 0%;
        # the fused call is one RPC and ~0.2s warm).
        net = self.net

        def _features_impl(params, x):
            x = (x - _SHIFT) / _SCALE
            return net.apply({"params": params}, x)

        def _distance_impl(params, lins, x, y):
            fx = _features_impl(params, x)
            fy = _features_impl(params, y)
            total = 0.0
            for f1, f2, w in zip(fx, fy, lins):
                d = (_normalize_tensor(f1) - _normalize_tensor(f2)) ** 2
                total = total + (d * w).sum(axis=-1).mean(axis=(1, 2))
            return total

        self._features_jit = jax.jit(_features_impl)
        self._distance_jit = jax.jit(_distance_impl)

    def _features(self, x):
        return self._features_jit(self.params, x)

    def __call__(self, x, y):
        """LPIPS distance per pair; x, y: (B, H, W, 3) in [-1, 1]."""
        return np.asarray(self._distance_jit(
            self.params, self.lins,
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32),
        ))


class LpipsEmbedder(LPIPS):
    """Flattened per-image embedding whose squared L2 distance equals the
    LPIPS distance (reference inference_util.LpipsEmbedder:15-31): per layer,
    sqrt(w) * unit-normalized features / sqrt(H*W), concatenated."""

    def __call__(self, x):
        if np.asarray(x).shape[-1] != 3:  # accept (B, C, H, W) too
            x = np.moveaxis(np.asarray(x), 1, -1)
        return np.asarray(self._embed_jit(
            self.params, self.lins, jnp.asarray(x, jnp.float32)
        ))

    @property
    def _embed_jit(self):
        # built lazily so LPIPS.__init__ stays the single constructor
        if not hasattr(self, "_embed_jit_cached"):
            net = self.net

            def _embed_impl(params, lins, x):
                x = (x - _SHIFT) / _SCALE
                feats = net.apply({"params": params}, x)
                pieces = []
                for f, w in zip(feats, lins):
                    fn = _normalize_tensor(f) * jnp.sqrt(w)
                    B, H, W, C = fn.shape
                    pieces.append(fn.reshape(B, -1) / np.sqrt(H * W))
                return jnp.concatenate(pieces, axis=1)

            self._embed_jit_cached = jax.jit(_embed_impl)
        return self._embed_jit_cached
