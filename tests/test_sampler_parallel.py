"""Parallel-windows rollout tests: the batched-windows path must agree with
the sequential path distributionally — verified structurally (same schedule,
obs frames preserved, every latent written) and statistically (per-frame
moments match across many seeds on a tiny model)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_tpu.ops.diffusion import GaussianDiffusion
from video_diffusion_tpu.ops.schedules import get_named_beta_schedule, space_timesteps
from video_diffusion_tpu.sampling import compile_schedule, sample_video
from video_diffusion_tpu.sampling.sampler import sample_video_windows_parallel
from video_diffusion_tpu.sampling.strategies import inference_strategies


@pytest.fixture(scope="module")
def tiny(tiny_video_model_and_diffusion, tiny_video_variables):
    model, _ = tiny_video_model_and_diffusion
    diffusion = GaussianDiffusion.from_betas(
        get_named_beta_schedule("linear", 100),
        use_timesteps=space_timesteps(100, "ddim5"),
        rescale_timesteps=True,
    )
    return model, tiny_video_variables, diffusion


def _setup(T=12, B=2, obs=2, step=5, max_frames=7):
    strategy = inference_strategies["independent"](
        video_length=T, num_obs=obs, max_frames=max_frames, step_size=step
    )
    schedule = compile_schedule(iter(strategy), max_frames, T)
    batch = jax.random.uniform(
        jax.random.PRNGKey(0), (B, T, 32, 32, 3), minval=-1, maxval=1
    )
    return schedule, batch


def test_parallel_windows_structure(tiny):
    model, variables, diffusion = tiny
    schedule, batch = _setup()
    out = np.asarray(
        sample_video_windows_parallel(
            model, variables, diffusion, schedule, batch, 2, jax.random.PRNGKey(1)
        )
    )
    assert out.shape == batch.shape
    np.testing.assert_array_equal(out[:, :2], np.asarray(batch)[:, :2])
    assert np.isfinite(out).all()
    assert np.abs(out[:, 2:]).max() > 1e-4  # all latents written


def test_parallel_matches_sequential_statistics(tiny):
    """Windows are independent, so the two orders sample the same
    distribution; compare per-frame means/stds over several seeds."""
    model, variables, diffusion = tiny
    schedule, batch = _setup(T=8, B=2, obs=2, step=3, max_frames=5)
    seq, par = [], []
    for seed in range(4):
        r = jax.random.PRNGKey(100 + seed)
        seq.append(np.asarray(sample_video(
            model, variables, diffusion, schedule, batch, 2, r)))
        par.append(np.asarray(sample_video_windows_parallel(
            model, variables, diffusion, schedule, batch, 2, r)))
    seq, par = np.stack(seq), np.stack(par)
    # moments over (seeds, batch, pixels) per frame
    m_seq = seq.mean(axis=(0, 1, 3, 4, 5))
    m_par = par.mean(axis=(0, 1, 3, 4, 5))
    s_seq = seq.std(axis=(0, 1, 3, 4, 5))
    s_par = par.std(axis=(0, 1, 3, 4, 5))
    np.testing.assert_allclose(m_seq, m_par, atol=0.12)
    np.testing.assert_allclose(s_seq, s_par, atol=0.12)


def test_chunked_scan_exact_parity(tiny):
    """t_chunk splits the reverse scan into multiple device calls while
    carrying (x, rng): the rng stream and arithmetic are unchanged, so the
    output must be bit-identical to the single-scan rollout."""
    model, variables, diffusion = tiny
    schedule, batch = _setup(T=8, B=2, obs=2, step=3, max_frames=5)
    r = jax.random.PRNGKey(7)
    single = np.asarray(sample_video_windows_parallel(
        model, variables, diffusion, schedule, batch, 2, r))
    chunked = np.asarray(sample_video_windows_parallel(
        model, variables, diffusion, schedule, batch, 2, r, t_chunk=2))
    np.testing.assert_allclose(single, chunked, atol=1e-5, rtol=1e-5)


def test_window_fold_cap(tiny, monkeypatch):
    """VDT_WINDOW_FOLD caps windows-per-device-call. A cap >= S must be
    bit-identical to the default all-folded path (same rng split sequence);
    smaller caps change the rng stream but sample the same distribution —
    checked structurally and statistically."""
    model, variables, diffusion = tiny
    schedule, batch = _setup(T=8, B=2, obs=2, step=3, max_frames=5)
    r = jax.random.PRNGKey(11)
    base = np.asarray(sample_video_windows_parallel(
        model, variables, diffusion, schedule, batch, 2, r))

    monkeypatch.setenv("VDT_WINDOW_FOLD", "64")  # >= any S: single chunk
    capped = np.asarray(sample_video_windows_parallel(
        model, variables, diffusion, schedule, batch, 2, r))
    np.testing.assert_array_equal(base, capped)

    # fold=2 with S=3 windows exercises the remainder chunk
    base_stack, fold_stack = [], []
    for seed in range(4):
        rs = jax.random.PRNGKey(200 + seed)
        monkeypatch.setenv("VDT_WINDOW_FOLD", "0")
        base_stack.append(np.asarray(sample_video_windows_parallel(
            model, variables, diffusion, schedule, batch, 2, rs)))
        monkeypatch.setenv("VDT_WINDOW_FOLD", "2")
        fold_stack.append(np.asarray(sample_video_windows_parallel(
            model, variables, diffusion, schedule, batch, 2, rs)))
    b, f = np.stack(base_stack), np.stack(fold_stack)
    np.testing.assert_array_equal(b[:, :, :2], f[:, :, :2])  # obs preserved
    assert np.isfinite(f).all()
    np.testing.assert_allclose(
        b.mean(axis=(0, 1, 3, 4, 5)), f.mean(axis=(0, 1, 3, 4, 5)), atol=0.12
    )
    np.testing.assert_allclose(
        b.std(axis=(0, 1, 3, 4, 5)), f.std(axis=(0, 1, 3, 4, 5)), atol=0.12
    )


def test_sequential_chunked_exact_parity(tiny):
    """sample_video with t_chunk (host-looped windows + chunked scans) must
    be bit-identical to the fully-scanned rollout: same split order, same
    arithmetic."""
    model, variables, diffusion = tiny
    schedule, batch = _setup(T=8, B=2, obs=2, step=3, max_frames=5)
    r = jax.random.PRNGKey(3)
    full = np.asarray(sample_video(
        model, variables, diffusion, schedule, batch, 2, r))
    chunked = np.asarray(sample_video(
        model, variables, diffusion, schedule, batch, 2, r, t_chunk=2))
    np.testing.assert_allclose(full, chunked, atol=1e-5, rtol=1e-5)
