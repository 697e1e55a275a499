"""Optimal-schedule search: the candidate evaluator must be ONE jitted,
candidate-vmapped computation (reference video_optimal_schedule.py:142-206
evaluates candidates one synchronous device call at a time; our docstring
promises a single batched call per greedy iteration)."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from video_diffusion_tpu.ops.diffusion import GaussianDiffusion
from video_diffusion_tpu.ops.schedules import get_named_beta_schedule


@pytest.fixture(scope="module")
def tiny(tiny_video_model_and_diffusion, tiny_video_variables):
    model, _ = tiny_video_model_and_diffusion
    diffusion = GaussianDiffusion.from_betas(
        get_named_beta_schedule("linear", 100), rescale_timesteps=True
    )
    return model, tiny_video_variables, diffusion


def test_candidate_evaluator_single_trace_per_bucket(tiny):
    """Greedy iterations with shrinking candidate sets must reuse compiled
    code: #traces == #distinct pow2 buckets, not #iterations."""
    import video_optimal_schedule as vos

    model, variables, diffusion = tiny
    t_seq = np.linspace(0, diffusion.num_timesteps - 1, 2).astype(int)[::-1]
    evaluator = vos.make_candidate_evaluator(model, diffusion, t_seq.copy())

    B, T, F = 1, 8, 5
    batch = np.random.default_rng(0).uniform(-1, 1, (B, T, 32, 32, 3)).astype(
        np.float32
    )
    rng = jax.random.PRNGKey(0)
    latent = [6, 7]
    base_obs = []
    results = []
    # 5, 4, 3 candidates -> buckets 8, 4, 4 -> exactly 2 traces
    for n_cand in (5, 4, 3):
        candidates = list(range(n_cand))
        rng, r = jax.random.split(rng)
        mses = vos.get_mse_for_candidates(
            evaluator, variables, batch, candidates, base_obs, latent, F, r
        )
        assert mses.shape == (n_cand,)
        assert np.isfinite(mses).all()
        results.append(mses)
    assert evaluator._cache_size() == 2, evaluator._cache_size()


def test_padded_candidates_do_not_change_results(tiny):
    """The pow2 padding must not leak into the returned slice: evaluating 3
    candidates (bucket 4) and the same 3 among 4 non-padded ones gives the
    same leading values (same per-candidate rng stream)."""
    import video_optimal_schedule as vos

    model, variables, diffusion = tiny
    t_seq = np.linspace(0, diffusion.num_timesteps - 1, 2).astype(int)[::-1]
    evaluator = vos.make_candidate_evaluator(model, diffusion, t_seq.copy())

    B, T, F = 1, 8, 5
    batch = np.random.default_rng(1).uniform(-1, 1, (B, T, 32, 32, 3)).astype(
        np.float32
    )
    r = jax.random.PRNGKey(3)
    latent = [6, 7]
    m3 = vos.get_mse_for_candidates(
        evaluator, variables, batch, [0, 1, 2], [], latent, F, r
    )
    m4 = vos.get_mse_for_candidates(
        evaluator, variables, batch, [0, 1, 2, 3], [], latent, F, r
    )
    np.testing.assert_allclose(m3, m4[:3], rtol=1e-5)
