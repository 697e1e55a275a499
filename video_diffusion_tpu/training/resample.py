"""Timestep importance samplers (reference improved_diffusion/resample.py).

Host-side numpy: the reference also samples timesteps on host
(resample.py:38-53). The loss-aware sampler's cross-rank all_gather
(resample.py:66-106) becomes a ``process_allgather`` when running multi-host;
single-process it is a no-op.
"""

import numpy as np


def create_named_schedule_sampler(name, diffusion):
    if name == "uniform":
        return UniformSampler(diffusion)
    elif name == "loss-second-moment":
        return LossSecondMomentResampler(diffusion)
    else:
        raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler:
    """Importance-sampling distribution over diffusion timesteps; sampled
    losses are reweighted so the objective stays unbiased."""

    def weights(self):
        raise NotImplementedError

    def sample(self, batch_size, rng: np.random.Generator):
        w = self.weights()
        p = w / np.sum(w)
        indices = rng.choice(len(p), size=(batch_size,), p=p)
        weights = 1.0 / (len(p) * p[indices])
        return indices.astype(np.int32), weights.astype(np.float32)


class UniformSampler(ScheduleSampler):
    def __init__(self, diffusion):
        self.diffusion = diffusion
        self._weights = np.ones([diffusion.num_timesteps])

    def weights(self):
        return self._weights


class LossAwareSampler(ScheduleSampler):
    def update_with_local_losses(self, local_ts, local_losses):
        """Update the reweighting from a batch of local losses.

        Multi-host: gathers (ts, losses) from all processes so every rank
        maintains the identical history (reference resample.py:66-106).
        """
        import jax

        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            local_ts = np.asarray(
                multihost_utils.process_allgather(np.asarray(local_ts))
            ).reshape(-1)
            local_losses = np.asarray(
                multihost_utils.process_allgather(np.asarray(local_losses))
            ).reshape(-1)
        self.update_with_all_losses(
            np.asarray(local_ts).tolist(), np.asarray(local_losses).tolist()
        )

    def update_with_all_losses(self, ts, losses):
        raise NotImplementedError


class LossSecondMomentResampler(LossAwareSampler):
    """Weights ∝ sqrt(E[loss²]) per timestep with uniform smoothing until the
    history buffer warms up (reference resample.py:125-154)."""

    def __init__(self, diffusion, history_per_term=10, uniform_prob=0.001):
        self.diffusion = diffusion
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        self._loss_history = np.zeros(
            [diffusion.num_timesteps, history_per_term], dtype=np.float64
        )
        self._loss_counts = np.zeros([diffusion.num_timesteps], dtype=int)

    def weights(self):
        if not self._warmed_up():
            return np.ones([self.diffusion.num_timesteps], dtype=np.float64)
        weights = np.sqrt(np.mean(self._loss_history**2, axis=-1))
        weights /= np.sum(weights)
        weights *= 1 - self.uniform_prob
        weights += self.uniform_prob / len(weights)
        return weights

    def update_with_all_losses(self, ts, losses):
        for t, loss in zip(ts, losses):
            if self._loss_counts[t] == self.history_per_term:
                self._loss_history[t, :-1] = self._loss_history[t, 1:]
                self._loss_history[t, -1] = loss
            else:
                self._loss_history[t, self._loss_counts[t]] = loss
                self._loss_counts[t] += 1

    def _warmed_up(self):
        return (self._loss_counts == self.history_per_term).all()
