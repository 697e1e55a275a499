"""Timestep importance samplers.

Same contract as the reference's schedule samplers
(/root/reference/improved_diffusion/resample.py): ``sample`` draws per-item
timesteps plus importance weights keeping the objective unbiased;
``loss-second-moment`` re-weights draws by sqrt(E[loss^2]) per timestep once
every timestep has a full loss history. Host-side numpy (the reference
samples on host too); the cross-rank loss gather becomes a
``process_allgather`` under multi-host SPMD.

Implementation is this framework's own: the per-timestep loss history is a
ring buffer of squared losses (the reference shifts a value buffer and
squares at read time — same mean-of-squares, cheaper update).
"""

import numpy as np


def create_named_schedule_sampler(name, diffusion):
    if name == "uniform":
        return UniformSampler(diffusion)
    elif name == "loss-second-moment":
        return LossSecondMomentResampler(diffusion)
    elif name == "high-t" or name.startswith("high-t-"):
        # Framework extension (no reference counterpart): "high-t" or
        # "high-t-<frac>-<band>", e.g. "high-t-0.5-0.6".
        parts = name.split("-")
        frac = float(parts[2]) if len(parts) > 2 else 0.5
        band = float(parts[3]) if len(parts) > 3 else 0.6
        return HighTMixtureSampler(diffusion, frac=frac, band_start=band)
    else:
        raise NotImplementedError(f"unknown schedule sampler: {name}")


class ScheduleSampler:
    """A probability distribution over diffusion timesteps. Sampled losses
    are divided by (T * p(t)), so any distribution leaves the expected loss
    unchanged."""

    def weights(self):
        raise NotImplementedError

    def sample(self, batch_size, rng: np.random.Generator):
        w = np.asarray(self.weights(), dtype=np.float64)
        p = w / w.sum()
        t = rng.choice(len(p), size=(batch_size,), p=p)
        iw = 1.0 / (len(p) * p[t])
        return t.astype(np.int32), iw.astype(np.float32)


class UniformSampler(ScheduleSampler):
    def __init__(self, diffusion):
        self.diffusion = diffusion
        self._w = np.ones(diffusion.num_timesteps)

    def weights(self):
        return self._w


class HighTMixtureSampler(ScheduleSampler):
    """Framework extension — no counterpart in the reference (whose only
    samplers are uniform and loss-second-moment, resample.py:8-14).

    Oversamples the high-noise band: p(t) is a mixture of ``1 - frac``
    uniform over all timesteps and ``frac`` uniform over
    ``[band_start * T, T)``. Importance weights (ScheduleSampler.sample)
    keep the objective unbiased, so this is pure variance reduction for
    the band where the observation-conditioning signal lives (the
    eps-space conditional signal scales as sqrt(alpha_bar_t), which is
    <0.1% of the loss mass at t in [600, 1000) — see QUALITY.md): the
    band gets ~frac of the gradient samples instead of ~(1 - band_start).
    """

    def __init__(self, diffusion, frac=0.5, band_start=0.6):
        assert 0.0 < frac < 1.0 and 0.0 < band_start < 1.0
        self.diffusion = diffusion
        T = diffusion.num_timesteps
        t0 = int(band_start * T)
        w = np.full(T, (1.0 - frac) / T)
        w[t0:] += frac / (T - t0)
        self._w = w

    def weights(self):
        return self._w


class LossAwareSampler(ScheduleSampler):
    def update_with_local_losses(self, local_ts, local_losses):
        """Feed a batch of (t, loss) observations into the history. Under
        multi-host SPMD every process contributes its local batch and all
        processes see the union, so the resampling distribution stays
        identical across hosts (the reference's all_gather,
        resample.py:66-106)."""
        import jax

        local_ts = np.asarray(local_ts)
        local_losses = np.asarray(local_losses)
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            local_ts = np.asarray(
                multihost_utils.process_allgather(local_ts)
            ).reshape(-1)
            local_losses = np.asarray(
                multihost_utils.process_allgather(local_losses)
            ).reshape(-1)
        self.update_with_all_losses(local_ts.tolist(), local_losses.tolist())

    def update_with_all_losses(self, ts, losses):
        raise NotImplementedError


class LossSecondMomentResampler(LossAwareSampler):
    """p(t) proportional to sqrt(E[loss(t)^2]) over the last
    ``history_per_term`` observations, mixed with ``uniform_prob`` of uniform
    mass; uniform until every timestep's ring buffer has filled once."""

    def __init__(self, diffusion, history_per_term=10, uniform_prob=0.001):
        self.diffusion = diffusion
        self.history_per_term = history_per_term
        self.uniform_prob = uniform_prob
        T = diffusion.num_timesteps
        self._sq = np.zeros((T, history_per_term))  # ring buffer of loss^2
        self._seen = np.zeros(T, dtype=np.int64)    # total writes per t

    def update_with_all_losses(self, ts, losses):
        for t, loss in zip(ts, losses):
            self._sq[t, self._seen[t] % self.history_per_term] = float(loss) ** 2
            self._seen[t] += 1

    def weights(self):
        T = self.diffusion.num_timesteps
        if (self._seen < self.history_per_term).any():
            return np.ones(T)
        w = np.sqrt(self._sq.mean(axis=1))
        w = w / w.sum() * (1.0 - self.uniform_prob)
        return w + self.uniform_prob / T
