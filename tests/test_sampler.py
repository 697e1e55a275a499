"""Rollout sampler tests: schedule compilation + the fully-scanned
sample_video on a tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_tpu.ops.diffusion import GaussianDiffusion
from video_diffusion_tpu.ops.schedules import get_named_beta_schedule, space_timesteps
from video_diffusion_tpu.sampling import compile_schedule, sample_video
from video_diffusion_tpu.sampling.strategies import inference_strategies


@pytest.fixture(scope="module")
def tiny(tiny_video_model_and_diffusion, tiny_video_variables):
    model, _ = tiny_video_model_and_diffusion
    # few-step diffusion for speed
    diffusion = GaussianDiffusion.from_betas(
        get_named_beta_schedule("linear", 100),
        use_timesteps=space_timesteps(100, "ddim5"),
        rescale_timesteps=True,
    )
    return model, tiny_video_variables, diffusion


def test_sample_video_full_rollout(tiny):
    model, variables, diffusion = tiny
    T, B, size = 12, 2, 32
    strategy = inference_strategies["autoreg"](
        video_length=T, num_obs=2, max_frames=5, step_size=2
    )
    schedule = compile_schedule(iter(strategy), 5, T)
    batch = jax.random.uniform(
        jax.random.PRNGKey(0), (B, T, size, size, 3), minval=-1, maxval=1
    )
    out = sample_video(
        model, variables, diffusion, schedule, batch, 2, jax.random.PRNGKey(1)
    )
    out = np.asarray(out)
    assert out.shape == (B, T, size, size, 3)
    assert np.isfinite(out).all()
    # observed prefix preserved exactly
    np.testing.assert_array_equal(out[:, :2], np.asarray(batch)[:, :2])
    # generated frames must have been written (buffer starts at zero)
    assert np.abs(out[:, 2:]).max() > 1e-4


def test_sample_video_deterministic(tiny):
    model, variables, diffusion = tiny
    T = 8
    strategy = inference_strategies["autoreg"](
        video_length=T, num_obs=2, max_frames=5, step_size=3
    )
    schedule = compile_schedule(iter(strategy), 5, T)
    batch = jax.random.uniform(
        jax.random.PRNGKey(0), (1, T, 32, 32, 3), minval=-1, maxval=1
    )
    o1 = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 2,
                     jax.random.PRNGKey(7))
    )
    o2 = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 2,
                     jax.random.PRNGKey(7))
    )
    o3 = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 2,
                     jax.random.PRNGKey(8))
    )
    np.testing.assert_array_equal(o1, o2)
    assert np.abs(o1[:, 2:] - o3[:, 2:]).max() > 1e-5


def test_unconditional_rollout(tiny):
    model, variables, diffusion = tiny
    T = 8
    strategy = inference_strategies["autoreg"](
        video_length=T, num_obs=0, max_frames=5, step_size=3
    )
    schedule = compile_schedule(iter(strategy), 5, T)
    batch = jnp.zeros((1, T, 32, 32, 3))
    out = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 0,
                     jax.random.PRNGKey(2))
    )
    assert np.isfinite(out).all()
    assert np.abs(out).max() > 1e-4


def test_hierarchy_rollout(tiny):
    """hierarchy-2 produces multiple segments (varying window widths +
    step-size backoff); the segmented rollout must cover every frame."""
    model, variables, diffusion = tiny
    T = 16
    strategy = inference_strategies["hierarchy-2"](
        video_length=T, num_obs=4, max_frames=6, step_size=3
    )
    schedule = compile_schedule(iter(strategy), 6, T)
    assert len(schedule.segments) >= 1
    batch = jax.random.uniform(
        jax.random.PRNGKey(3), (1, T, 32, 32, 3), minval=-1, maxval=1
    )
    out = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 4,
                     jax.random.PRNGKey(4))
    )
    assert np.isfinite(out).all()
    np.testing.assert_array_equal(out[:, :4], np.asarray(batch)[:, :4])
    # all non-observed frames written
    assert (np.abs(out[:, 4:]).reshape(T - 4, -1).max(axis=1) > 1e-4).all()


def test_ragged_tail_rollout(tiny):
    """(T - obs) not divisible by step_size -> narrower final window in its
    own segment."""
    model, variables, diffusion = tiny
    T = 11  # obs 2, step 3 -> windows of width 5,5,5 and final width 3? (9/3=3 exact) use T=12? 12-2=10 -> 3 windows of 3 + tail 1
    T = 12
    strategy = inference_strategies["autoreg"](
        video_length=T, num_obs=2, max_frames=5, step_size=3
    )
    schedule = compile_schedule(iter(strategy), 5, T)
    widths = [seg.frame_indices.shape[1] for seg in schedule.segments]
    assert len(set(widths)) >= 2, widths  # ragged tail creates a new width
    batch = jax.random.uniform(
        jax.random.PRNGKey(5), (1, T, 32, 32, 3), minval=-1, maxval=1
    )
    out = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 2,
                     jax.random.PRNGKey(6))
    )
    assert np.isfinite(out).all()
    assert (np.abs(out[:, 2:]).reshape(T - 2, -1).max(axis=1) > 1e-4).all()


def test_trajectory_rollout(tiny):
    """--save_all_timesteps path: per-timestep arrays with constant observed
    prefix and final slice equal to the returned samples."""
    from video_diffusion_tpu.sampling.sampler import sample_video_with_trajectory

    model, variables, diffusion = tiny
    T = 8
    strategy = inference_strategies["autoreg"](
        video_length=T, num_obs=2, max_frames=5, step_size=3
    )
    schedule = compile_schedule(iter(strategy), 5, T)
    batch = jax.random.uniform(
        jax.random.PRNGKey(8), (1, T, 32, 32, 3), minval=-1, maxval=1
    )
    samples, all_ts = sample_video_with_trajectory(
        model, variables, diffusion, schedule, batch, 2, jax.random.PRNGKey(9)
    )
    K = diffusion.num_timesteps
    assert all_ts.shape == (1, K, T, 32, 32, 3)
    # observed prefix constant across timesteps
    np.testing.assert_array_equal(
        all_ts[:, 0, :2], np.broadcast_to(np.asarray(batch)[:, :2], all_ts[:, 0, :2].shape)
    )
    np.testing.assert_array_equal(all_ts[:, -1, :2], all_ts[:, 0, :2])
    # last timestep slice equals the final samples on latent frames
    np.testing.assert_allclose(all_ts[:, -1, 2:], samples[:, 2:], atol=1e-6)
    assert np.isfinite(all_ts).all()


def test_horizontal_observed_frames_modes_differ(tiny):
    """sample_video_horizontal must honor observed_frames: the x_t and
    x_t_minus_1 conditioning-content modes (reference
    scripts/video_sample_full.py:299, :656-663) change the result vs x_0."""
    from video_diffusion_tpu.sampling.sampler import sample_video_horizontal

    model, variables, diffusion = tiny
    # fresh-init params have zero-init output convs => the net is constant-0
    # and insensitive to conditioning; perturb every leaf so the model
    # actually reads its inputs
    leaves, treedef = jax.tree_util.tree_flatten(variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    variables = jax.tree_util.tree_unflatten(
        treedef,
        [
            l + 0.02 * jax.random.normal(k, l.shape, l.dtype)
            for l, k in zip(leaves, keys)
        ],
    )
    T = 8
    strategy = inference_strategies["autoreg"](
        video_length=T, num_obs=2, max_frames=5, step_size=3
    )
    schedule = compile_schedule(iter(strategy), 5, T)
    batch = jax.random.uniform(
        jax.random.PRNGKey(3), (1, T, 32, 32, 3), minval=-1, maxval=1
    )
    outs = {}
    for mode in ("x_0", "x_t", "x_t_minus_1"):
        out = sample_video_horizontal(
            model, variables, diffusion, schedule, batch, 2,
            jax.random.PRNGKey(4), observed_frames=mode,
        )
        outs[mode] = np.asarray(out)
        assert outs[mode].shape == (1, T, 32, 32, 3)
        assert np.isfinite(outs[mode]).all()
        # observed prefix always returned as-is
        np.testing.assert_array_equal(outs[mode][:, :2], np.asarray(batch)[:, :2])
    # non-default modes feed noised observations to the model -> different output
    assert np.abs(outs["x_t"][:, 2:] - outs["x_0"][:, 2:]).max() > 1e-4
    assert np.abs(outs["x_t_minus_1"][:, 2:] - outs["x_0"][:, 2:]).max() > 1e-4


def test_video_sample_full_script_threads_observed_frames(tmp_path, monkeypatch):
    """Regression: scripts/video_sample_full.py must forward
    --observed_frames into sample_video_horizontal (it used to drop it)."""
    import importlib
    import os
    import pathlib
    import sys
    import types

    scripts_dir = os.path.join(os.path.dirname(__file__), "..", "scripts")
    monkeypatch.syspath_prepend(scripts_dir)
    mod = importlib.import_module("video_sample_full")

    captured = {}

    def fake_horizontal(model, v, diffusion, schedule, b, obs_length, r, **kw):
        captured.update(kw)
        return jnp.zeros_like(b)

    monkeypatch.setattr(mod, "sample_video_horizontal", fake_horizontal)

    class _DS:
        def __len__(self):
            return 1

        def __getitem__(self, i):
            return (np.zeros((8, 32, 32, 3), dtype=np.float32),)

    eval_dir = pathlib.Path(tmp_path)
    (eval_dir / "samples").mkdir()
    args = types.SimpleNamespace(
        inference_mode="autoreg", T=8, obs_length=2, max_frames=5, step_size=3,
        vertical_steps=0, use_gradient_method=False, batch_size=1,
        num_samples=1, sample_idx=None, seed=0, eval_dir=eval_dir,
        observed_frames="x_t_minus_1",
    )

    class _FakeModel:
        pass

    from video_diffusion_tpu.ops.diffusion import GaussianDiffusion
    from video_diffusion_tpu.ops.schedules import (
        get_named_beta_schedule,
        space_timesteps,
    )

    diffusion = GaussianDiffusion.from_betas(
        get_named_beta_schedule("linear", 100),
        use_timesteps=space_timesteps(100, "ddim2"),
    )
    mod.main(args, _FakeModel(), {}, diffusion, _DS(), [0])
    assert captured.get("observed_frames") == "x_t_minus_1"


def test_bf16_sample_state_knob(tiny, monkeypatch):
    """VDT_SAMPLE_DTYPE=bf16 narrows the reverse-scan carry to bf16 (HBM
    lever, BENCH.md 'loop fusions'): output stays f32, close to the f32
    rollout, and the chunked path stays bit-identical to the unchunked one
    under the knob (the runner cache re-keys on the resolved dtype)."""
    model, variables, diffusion = tiny
    T = 8
    strategy = inference_strategies["autoreg"](
        video_length=T, num_obs=2, max_frames=5, step_size=3
    )
    schedule = compile_schedule(iter(strategy), 5, T)
    batch = jax.random.uniform(
        jax.random.PRNGKey(0), (1, T, 32, 32, 3), minval=-1, maxval=1
    )

    f32 = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 2,
                     jax.random.PRNGKey(7))
    )
    monkeypatch.setenv("VDT_SAMPLE_DTYPE", "bf16")
    bf16 = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 2,
                     jax.random.PRNGKey(7))
    )
    bf16_chunked = np.asarray(
        sample_video(model, variables, diffusion, schedule, batch, 2,
                     jax.random.PRNGKey(7), t_chunk=2)
    )
    assert bf16.dtype == np.float32
    assert np.isfinite(bf16).all()
    assert np.abs(bf16).max() < 5.0  # sane sample range
    # observed prefix is spliced from the f32 buffer either way
    np.testing.assert_array_equal(bf16[:, :2], f32[:, :2])
    # the knob took effect (different noise rounding -> different sample;
    # ancestral chains are chaotic, so no closeness bound is asserted —
    # quality is A/B'd on the trained model, BENCH.md)
    assert np.abs(bf16[:, 2:] - f32[:, 2:]).max() > 0.0
    # chunked scan stays bit-identical under the knob
    np.testing.assert_array_equal(bf16, bf16_chunked)


def test_adaptive_rollout_t_chunk_parity(tiny):
    """sample_video_adaptive with a t_chunk must be bit-identical to the
    unchunked run (same rng stream; the chunked runner replays the same
    per-step draws) — the adaptive path's tunnel-deadline escape."""
    from video_diffusion_tpu.sampling.sampler import sample_video_adaptive

    model, variables, diffusion = tiny
    T, B = 10, 2

    def make_strategy():
        return inference_strategies["adaptive-autoreg"](
            distance="l2", video_length=T, num_obs=2, max_frames=5,
            step_size=3,
        )

    batch = jax.random.uniform(
        jax.random.PRNGKey(1), (B, T, 32, 32, 3), minval=-1, maxval=1
    )
    full = np.asarray(
        sample_video_adaptive(
            model, variables, diffusion, make_strategy(), batch, 2,
            jax.random.PRNGKey(9),
        )
    )
    chunked = np.asarray(
        sample_video_adaptive(
            model, variables, diffusion, make_strategy(), batch, 2,
            jax.random.PRNGKey(9), t_chunk=2,
        )
    )
    assert np.isfinite(full).all()
    np.testing.assert_array_equal(full[:, :2], np.asarray(batch[:, :2]))
    np.testing.assert_allclose(chunked, full, atol=1e-5)


def test_compile_schedule_tolerates_overflowing_window():
    """ExpPast at T=100/max_frames=10/step_size=5 yields an 11-frame window
    (log2(95)->6 obs + 5 latent). The reference feeds oversized windows to
    the model (inference_util.py:280-292 fills but never truncates); the
    schedule compiler must warn, not crash."""
    import warnings

    from video_diffusion_tpu.sampling.sampler import compile_schedule
    from video_diffusion_tpu.sampling.strategies import inference_strategies

    it = inference_strategies["exp-past"](
        video_length=100, num_obs=5, max_frames=10, step_size=5
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sched = compile_schedule(it, max_frames=10, video_length=100)
    assert any("exceeds max_frames" in str(x.message) for x in w)
    widths = {seg.frame_indices.shape[1] for seg in sched.segments}
    assert max(widths) == 11
    # every frame is generated exactly once across the schedule
    gen = [i for _, lat in sched.steps for i in lat]
    assert sorted(gen) == list(range(5, 100))
