"""Numerical tests of q/p distributions, losses, samplers (against closed
forms and self-consistency — the reference has no tests; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_tpu.ops.diffusion import (
    GaussianDiffusion,
    LossType,
    ModelMeanType,
    ModelVarType,
    create_diffusion,
)
from video_diffusion_tpu.ops.losses import (
    discretized_gaussian_log_likelihood,
    mean_flat,
    normal_kl,
)
from video_diffusion_tpu.ops.schedules import get_named_beta_schedule


@pytest.fixture(scope="module")
def diff():
    return GaussianDiffusion.from_betas(get_named_beta_schedule("linear", 100))


def test_q_sample_moments(diff):
    key = jax.random.PRNGKey(0)
    x0 = jnp.ones((4, 1000))
    t = jnp.array([0, 10, 50, 99])
    noise = jax.random.normal(key, x0.shape)
    xt = diff.q_sample(x0, t, noise)
    abar = np.asarray(diff.alphas_cumprod)[np.asarray(t)]
    means = np.asarray(xt).mean(axis=1)
    stds = np.asarray(xt).std(axis=1)
    np.testing.assert_allclose(means, np.sqrt(abar), atol=0.15)
    np.testing.assert_allclose(stds, np.sqrt(1 - abar), atol=0.15)


def test_negative_t_wraps_like_torch(diff):
    """t=-1 must index the LAST table row (torch arr[t-1] semantics with t=0;
    the x_t_minus_1 conditioning path depends on it)."""
    x0 = jnp.ones((1, 4))
    noise = jnp.zeros((1, 4))
    out = diff.q_sample(x0, jnp.array([-1]), noise)
    expected = np.asarray(diff.sqrt_alphas_cumprod)[-1]
    np.testing.assert_allclose(np.asarray(out)[0, 0], expected, rtol=1e-6)


def test_q_posterior_t0_returns_x0(diff):
    x0 = jnp.full((2, 8), 0.3)
    xt = jnp.full((2, 8), -0.7)
    mean, var, _ = diff.q_posterior_mean_variance(x0, xt, jnp.array([0, 0]))
    np.testing.assert_allclose(np.asarray(mean), 0.3, rtol=1e-5)


def test_xstart_eps_roundtrip(diff):
    key = jax.random.PRNGKey(1)
    x0 = jax.random.uniform(key, (3, 16), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.array([3, 47, 88])
    xt = diff.q_sample(x0, t, noise)
    x0_rec = diff._predict_xstart_from_eps(xt, t, noise)
    np.testing.assert_allclose(np.asarray(x0_rec), np.asarray(x0), atol=1e-3)
    eps_rec = diff._predict_eps_from_xstart(xt, t, x0)
    np.testing.assert_allclose(np.asarray(eps_rec), np.asarray(noise), atol=1e-3)


def test_p_mean_variance_perfect_model(diff):
    """With a model that predicts the true eps, p mean equals the q posterior
    mean around the true x0."""
    key = jax.random.PRNGKey(3)
    x0 = jax.random.uniform(key, (2, 8), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    t = jnp.array([20, 70])
    xt = diff.q_sample(x0, t, noise)
    out = diff.p_mean_variance(lambda x, tt: noise, xt, t)
    true_mean, _, _ = diff.q_posterior_mean_variance(x0, xt, t)
    np.testing.assert_allclose(np.asarray(out["mean"]), np.asarray(true_mean), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out["pred_xstart"]), np.asarray(x0), atol=1e-3)


def test_vb_terms_perfect_model_small(diff):
    """KL of a perfect eps-model with FIXED_SMALL variance is ~0 at inner
    timesteps."""
    d = GaussianDiffusion.from_betas(
        get_named_beta_schedule("linear", 100),
        model_var_type=ModelVarType.FIXED_SMALL,
    )
    key = jax.random.PRNGKey(5)
    x0 = jax.random.uniform(key, (2, 64), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(6), x0.shape)
    t = jnp.array([50, 50])
    xt = d.q_sample(x0, t, noise)
    out = d._vb_terms_bpd(lambda x, tt: noise, x0, xt, t, clip_denoised=False)
    assert np.asarray(out["output"]).max() < 1e-4


def test_learned_range_variance_interpolates(diff):
    d = GaussianDiffusion.from_betas(
        get_named_beta_schedule("linear", 100),
        model_var_type=ModelVarType.LEARNED_RANGE,
    )
    x = jnp.zeros((2, 4))
    t = jnp.array([30, 60])
    # var output -1 -> posterior (min), +1 -> beta (max)
    for v, table in [(-1.0, d.posterior_log_variance_clipped), (1.0, d.log_betas)]:
        model_out = jnp.concatenate([jnp.zeros((2, 4)), jnp.full((2, 4), v)], axis=-1)
        _, _, logvar = d.model_variance_terms(model_out, x, t)
        expected = np.asarray(table)[np.asarray(t)]
        np.testing.assert_allclose(np.asarray(logvar)[:, 0], expected, rtol=1e-5)


def test_training_losses_mse_perfect_model(diff):
    key = jax.random.PRNGKey(7)
    x0 = jax.random.uniform(key, (2, 32), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(8), x0.shape)
    t = jnp.array([10, 90])
    terms = diff.training_losses(
        lambda x, tt, cond=None: noise, x0, t, jax.random.PRNGKey(9), noise=noise
    )
    assert np.asarray(terms["mse"]).max() < 1e-10
    assert np.asarray(terms["loss"]).max() < 1e-10


def test_training_losses_masked(diff):
    """mean_flat(mask) semantics: multiplied but normalized by total size."""
    x0 = jnp.zeros((1, 10))
    t = jnp.array([50])
    mask = jnp.zeros((1, 10)).at[:, :5].set(1.0)
    terms = diff.training_losses(
        lambda x, tt, cond=None: jnp.zeros_like(x0),
        x0,
        t,
        jax.random.PRNGKey(10),
        latent_mask=mask,
    )
    terms_full = diff.training_losses(
        lambda x, tt, cond=None: jnp.zeros_like(x0),
        x0,
        t,
        jax.random.PRNGKey(10),
    )
    # same noise draw, masked loss is roughly half (mask keeps half the terms)
    assert np.asarray(terms["mse"]) < np.asarray(terms_full["mse"])


def test_ddim_deterministic_with_eta0(diff):
    x = jax.random.normal(jax.random.PRNGKey(11), (2, 8))
    t = jnp.array([50, 50])
    model_fn = lambda xx, tt: 0.1 * xx
    o1 = diff.ddim_sample(model_fn, x, t, jax.random.PRNGKey(0), eta=0.0)
    o2 = diff.ddim_sample(model_fn, x, t, jax.random.PRNGKey(99), eta=0.0)
    np.testing.assert_allclose(np.asarray(o1["sample"]), np.asarray(o2["sample"]))


def test_ddim_reverse_then_forward_roundtrip(diff):
    """Reverse ODE then forward DDIM at the same t approximately invert."""
    x = 0.5 * jax.random.normal(jax.random.PRNGKey(12), (2, 8))
    model_fn = lambda xx, tt: 0.05 * xx
    t = jnp.array([40, 40])
    fwd = diff.ddim_reverse_sample(model_fn, x, t)
    # one step of the deterministic sampler at t+1 should come back near x
    back = diff.ddim_sample(
        model_fn, fwd["sample"], t + 1, jax.random.PRNGKey(0), eta=0.0,
        clip_denoised=False,
    )
    np.testing.assert_allclose(np.asarray(back["sample"]), np.asarray(x), atol=0.05)


def test_p_sample_loop_runs_and_is_deterministic(diff):
    model_fn = lambda x, tt, rng=None: 0.1 * x
    s1 = diff.p_sample_loop(model_fn, (2, 8), jax.random.PRNGKey(1))
    s2 = diff.p_sample_loop(model_fn, (2, 8), jax.random.PRNGKey(1))
    s3 = diff.p_sample_loop(model_fn, (2, 8), jax.random.PRNGKey(2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))
    assert np.abs(np.asarray(s1) - np.asarray(s3)).max() > 1e-3
    assert np.isfinite(np.asarray(s1)).all()


def test_calc_bpd_loop_subsampled_2d_tseq(diff):
    """2-D per-item t_seq (used by the optimal-schedule search,
    gaussian_diffusion.py:959-969)."""
    x0 = jax.random.uniform(jax.random.PRNGKey(13), (3, 16), minval=-1, maxval=1)
    t_seq = np.array([[5, 50, 95], [10, 40, 80], [0, 30, 60]])  # (N=3, K=3)
    out = diff.calc_bpd_loop_subsampled(
        lambda x, tt: jnp.zeros_like(x), x0, jax.random.PRNGKey(14), t_seq=t_seq
    )
    assert out["vb"].shape == (3, 3)
    assert out["total_bpd"].shape == (3,)
    assert np.isfinite(np.asarray(out["total_bpd"])).all()


def test_rescale_timesteps_and_respacing_map():
    d = create_diffusion(steps=1000, timestep_respacing="ddim250", rescale_timesteps=True)
    t = jnp.array([0, 100, 249])
    scaled = np.asarray(d.scale_timesteps(t))
    # maps through timestep_map (stride 4) then rescales by 1000/1000
    np.testing.assert_allclose(scaled, [0.0, 400.0, 996.0])


def test_normal_kl_closed_form():
    kl = normal_kl(0.0, 0.0, 0.0, 0.0)
    assert float(kl) == pytest.approx(0.0)
    # KL(N(1, e^0) || N(0, e^0)) = 0.5
    assert float(normal_kl(1.0, 0.0, 0.0, 0.0)) == pytest.approx(0.5)
    # broadcast over arrays
    kl = normal_kl(jnp.zeros((2, 3)), jnp.zeros((2, 3)), 1.0, 0.0)
    np.testing.assert_allclose(np.asarray(kl), 0.5)


def test_discretized_gaussian_ll_normalizes():
    """Sum of bin probabilities over the 256 bins ≈ 1 for a mid-range mean."""
    bins = np.linspace(-1, 1, 256)
    x = jnp.asarray(bins)
    ll = discretized_gaussian_log_likelihood(
        x, means=jnp.zeros_like(x), log_scales=jnp.full_like(x, -2.0)
    )
    total = np.exp(np.asarray(ll)).sum()
    assert total == pytest.approx(1.0, abs=0.02)


def test_mean_flat_mask_not_normalized():
    x = jnp.ones((2, 4, 4))
    mask = jnp.zeros((2, 4, 1)).at[:, :2].set(1.0)
    out = mean_flat(x, mask=mask)
    np.testing.assert_allclose(np.asarray(out), 0.5)
