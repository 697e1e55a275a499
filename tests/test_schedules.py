"""Golden tests of beta schedules, respacing, and coefficient tables against
closed forms (build plan step 1, SURVEY.md §7)."""

import math

import numpy as np
import pytest

from video_diffusion_tpu.ops import schedules
from video_diffusion_tpu.ops.diffusion import compute_coefficients


def test_linear_schedule_endpoints():
    betas = schedules.get_named_beta_schedule("linear", 1000)
    assert betas.shape == (1000,)
    assert betas[0] == pytest.approx(1e-4)
    assert betas[-1] == pytest.approx(0.02)
    # scale-invariance in the continuum limit
    betas_500 = schedules.get_named_beta_schedule("linear", 500)
    assert betas_500[0] == pytest.approx(2e-4)
    assert betas_500[-1] == pytest.approx(0.04)


def test_noisier_linear_schedule():
    betas = schedules.get_named_beta_schedule("noisier_linear", 1000)
    assert betas[-1] == pytest.approx(0.025)


def test_cosine_schedule_closed_form():
    N = 100
    betas = schedules.get_named_beta_schedule("cosine", N)

    def alpha_bar(t):
        return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

    for i in [0, 1, 50, 98]:
        expected = min(1 - alpha_bar((i + 1) / N) / alpha_bar(i / N), 0.999)
        assert betas[i] == pytest.approx(expected)
    assert betas.max() <= 0.999


def test_space_timesteps_ddim():
    # "ddimN": evenly strided with integer stride
    steps = schedules.space_timesteps(1000, "ddim250")
    assert steps == set(range(0, 1000, 4))
    steps = schedules.space_timesteps(100, "ddim25")
    assert steps == set(range(0, 100, 4))
    with pytest.raises(ValueError):
        schedules.space_timesteps(1000, "ddim999")


def test_space_timesteps_sections():
    steps = schedules.space_timesteps(300, [10, 15, 20])
    assert len(steps) == 45
    assert max(steps) < 300
    # full retention
    assert schedules.space_timesteps(100, [100]) == set(range(100))
    # string form
    assert schedules.space_timesteps(300, "10,15,20") == steps


def test_coefficients_closed_form():
    betas = schedules.get_named_beta_schedule("linear", 50)
    c = compute_coefficients(betas)
    alphas = 1 - betas
    abar = np.cumprod(alphas)
    np.testing.assert_allclose(c["alphas_cumprod"], abar)
    np.testing.assert_allclose(c["sqrt_alphas_cumprod"], np.sqrt(abar))
    np.testing.assert_allclose(
        c["sqrt_recipm1_alphas_cumprod"], np.sqrt(1 / abar - 1)
    )
    abar_prev = np.append(1.0, abar[:-1])
    np.testing.assert_allclose(
        c["posterior_variance"], betas * (1 - abar_prev) / (1 - abar)
    )
    np.testing.assert_allclose(
        c["posterior_mean_coef1"] + 0, betas * np.sqrt(abar_prev) / (1 - abar)
    )
    # posterior mean coefficients sum: mu = c1*x0 + c2*xt recovers x0 at t=0
    assert c["posterior_mean_coef1"][0] == pytest.approx(1.0)
    assert c["posterior_mean_coef2"][0] == pytest.approx(0.0)
    # FIXED_LARGE variance table
    np.testing.assert_allclose(
        c["fixed_large_variance"], np.append(c["posterior_variance"][1], betas[1:])
    )


def test_respaced_alphas_match_original():
    """SpacedDiffusion rebuilds betas so that the retained steps keep their
    original alpha_cumprod (respace.py:74-81)."""
    from video_diffusion_tpu.ops.diffusion import GaussianDiffusion

    betas = schedules.get_named_beta_schedule("linear", 100)
    keep = schedules.space_timesteps(100, "ddim25")
    full = compute_coefficients(betas)
    spaced = GaussianDiffusion.from_betas(betas, use_timesteps=keep)
    kept_sorted = sorted(keep)
    np.testing.assert_allclose(
        np.asarray(spaced.alphas_cumprod),
        full["alphas_cumprod"][kept_sorted],
        rtol=1e-5,
    )
    np.testing.assert_array_equal(np.asarray(spaced.timestep_map), kept_sorted)
    assert spaced.num_timesteps == 25
    assert spaced.original_num_steps == 100
