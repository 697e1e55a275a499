"""Small Flax ConvNet probes for CARLA downstream evaluation (the reference
fine-tunes torchvision efficientnet/resnet CNNs to classify the town or
regress ego-coordinates from frames — scripts/train_carla_classifier.py,
train_carla_regressor*.py). A compact residual CNN trained from scratch fills
the same role on TPU without torchvision weights."""

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn


class ResidualStage(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.Conv(self.features, (3, 3), strides=(2, 2))(x)
        h = nn.GroupNorm(num_groups=8)(h)
        h = nn.relu(h)
        h2 = nn.Conv(self.features, (3, 3))(h)
        h2 = nn.GroupNorm(num_groups=8)(h2)
        return nn.relu(h + h2)


class ProbeCNN(nn.Module):
    """Frames (B, H, W, 3) in [-1,1] -> (B, out_dim) logits/regression.

    ``n_heads`` > 1 gives the multihead regressor variant (one head per town,
    reference train_carla_regressor_multihead.py).
    """

    out_dim: int
    widths: Sequence[int] = (32, 64, 128, 256)
    n_heads: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        h = nn.Conv(self.widths[0], (5, 5))(x)
        h = nn.relu(h)
        for w in self.widths:
            h = ResidualStage(w)(h, train=train)
        h = h.mean(axis=(1, 2))  # global average pool
        h = nn.Dense(256)(h)
        h = nn.relu(h)
        if self.n_heads == 1:
            return nn.Dense(self.out_dim)(h)
        return jnp.stack(
            [nn.Dense(self.out_dim, name=f"head_{i}")(h) for i in range(self.n_heads)],
            axis=1,
        )
