"""Schedule-sampler semantics: unbiasedness, warmup, and second-moment
re-weighting (reference resample.py:38-53, :125-154 contract)."""

import numpy as np

from video_diffusion_tpu.training.resample import (
    HighTMixtureSampler,
    LossSecondMomentResampler,
    UniformSampler,
    create_named_schedule_sampler,
)


class _FakeDiffusion:
    num_timesteps = 20


def test_uniform_sampler_unbiased_weights():
    s = UniformSampler(_FakeDiffusion())
    rng = np.random.default_rng(0)
    t, w = s.sample(4096, rng)
    assert t.min() >= 0 and t.max() < 20
    np.testing.assert_allclose(w, 1.0)  # uniform => importance weight 1


def test_loss_second_moment_warmup_then_reweights():
    d = _FakeDiffusion()
    s = LossSecondMomentResampler(d, history_per_term=3, uniform_prob=0.01)
    # cold: uniform
    np.testing.assert_allclose(s.weights(), np.ones(d.num_timesteps))

    # fill history: timestep 5 consistently lossy, everything else tiny
    for _ in range(3):
        ts = list(range(d.num_timesteps))
        losses = [5.0 if t == 5 else 0.1 for t in ts]
        s.update_with_all_losses(ts, losses)
    w = s.weights()
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-9)
    assert w[5] == w.max()
    assert w[5] / w[0] > 10  # sqrt(E[l^2]) ratio = 50, minus uniform mixing
    # every timestep keeps at least the uniform floor
    assert (w >= 0.01 / d.num_timesteps - 1e-12).all()


def test_ring_buffer_keeps_last_k():
    d = _FakeDiffusion()
    s = LossSecondMomentResampler(d, history_per_term=2, uniform_prob=0.0)
    # overfill timestep 0: only the last two observations must matter
    s.update_with_all_losses([0, 0, 0, 0], [100.0, 100.0, 1.0, 1.0])
    for t in range(1, d.num_timesteps):
        s.update_with_all_losses([t, t], [1.0, 1.0])
    w = s.weights()
    np.testing.assert_allclose(w, w[0])  # all E[l^2] equal -> uniform


def test_importance_weights_unbias_expectation():
    """E[w * f(t)] under the sampler == E_uniform[f(t)] for any f."""
    d = _FakeDiffusion()
    s = LossSecondMomentResampler(d, history_per_term=1, uniform_prob=0.05)
    ts = list(range(d.num_timesteps))
    s.update_with_all_losses(ts, [float(t + 1) for t in ts])
    rng = np.random.default_rng(1)
    t, w = s.sample(200_000, rng)
    f = (np.asarray(t) ** 2).astype(np.float64)
    est = (w * f).mean()
    truth = np.mean(np.arange(d.num_timesteps) ** 2)
    np.testing.assert_allclose(est, truth, rtol=0.05)


def test_factory_names():
    assert isinstance(
        create_named_schedule_sampler("uniform", _FakeDiffusion()),
        UniformSampler,
    )
    assert isinstance(
        create_named_schedule_sampler("loss-second-moment", _FakeDiffusion()),
        LossSecondMomentResampler,
    )
    assert isinstance(
        create_named_schedule_sampler("high-t", _FakeDiffusion()),
        HighTMixtureSampler,
    )


def test_high_t_mixture_band_mass_and_unbiasedness():
    d = _FakeDiffusion()  # T=20
    s = create_named_schedule_sampler("high-t-0.5-0.6", d)
    w = np.asarray(s.weights(), dtype=np.float64)
    p = w / w.sum()
    # band [12, 20) carries 0.5 (mixture) + 0.4 * 0.5 (uniform part) = 0.7
    np.testing.assert_allclose(p[12:].sum(), 0.7, rtol=1e-12)
    # inside each regime the distribution is flat
    np.testing.assert_allclose(p[:12], p[0])
    np.testing.assert_allclose(p[12:], p[12])

    # importance weights keep E[w * f(t)] == E_uniform[f(t)]
    rng = np.random.default_rng(2)
    t, iw = s.sample(200_000, rng)
    f = (np.asarray(t) ** 2).astype(np.float64)
    est = (iw * f).mean()
    truth = np.mean(np.arange(d.num_timesteps) ** 2)
    np.testing.assert_allclose(est, truth, rtol=0.05)
    # the band actually gets ~70% of the draws
    np.testing.assert_allclose((t >= 12).mean(), 0.7, atol=0.01)
