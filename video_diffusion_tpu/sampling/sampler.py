"""Device-resident long-video sampling.

The reference drives every (inference-step × diffusion-timestep) pair as a
synchronous GPU round trip from Python (video_sample.py:150-168). Here the
whole rollout is ONE jitted computation:

* a non-adaptive strategy is compiled into static index/mask tables
  (``compile_schedule``) — (num_steps, max_frames) windows, padded with
  dummy slots pointing at a scratch row of the samples buffer;
* ``sample_video`` runs ``lax.scan`` over inference steps; each step gathers
  its window from the device-resident samples buffer, runs an inner
  ``lax.scan`` over diffusion timesteps, and scatters the generated latent
  frames back. Zero host round trips, so TPU stays busy end to end;
* adaptive (content-dependent) strategies use ``sample_window`` — one jitted
  window computation driven by the host strategy loop, host-in-the-loop once
  per inference step (not per diffusion step).

Reference window semantics kept exactly: windows are laid out
[obs..., latent...]; the inner loop starts from x0 (NOT fresh noise —
video_sample.py:150); obs slots are respliced by the CondMarg model each step
and only latent slots are scattered back (video_sample.py:184-189).
"""

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wrappers import make_video_model_fn


@dataclass(frozen=True)
class Schedule:
    """Static index/mask tables for a full rollout.

    frame_indices[s, f]   — gather index into the samples buffer (T = scratch)
    obs_mask[s, f]        — 1 where slot f of step s is an observed frame
    latent_mask[s, f]     — 1 where slot f is generated this step
    scatter_indices[s, f] — write index for slot f (T = discard)
    """

    frame_indices: np.ndarray
    obs_mask: np.ndarray
    latent_mask: np.ndarray
    scatter_indices: np.ndarray
    video_length: int
    max_frames: int

    @property
    def num_steps(self):
        return len(self.frame_indices)


def compile_schedule(strategy_iter, max_frames, video_length) -> Schedule:
    """Run a (non-adaptive) strategy iterator to exhaustion and pack its steps
    into static tables; every window is padded to exactly max_frames slots."""
    steps = list(strategy_iter)
    S, F, T = len(steps), max_frames, video_length
    fidx = np.full((S, F), T, dtype=np.int32)  # default: scratch row
    obs_m = np.zeros((S, F), dtype=np.float32)
    lat_m = np.zeros((S, F), dtype=np.float32)
    scat = np.full((S, F), T, dtype=np.int32)
    for s, (obs, latent) in enumerate(steps):
        window = list(obs) + list(latent)
        assert len(window) <= F, (s, window)
        fidx[s, : len(window)] = window
        obs_m[s, : len(obs)] = 1.0
        lat_m[s, len(obs) : len(window)] = 1.0
        scat[s, len(obs) : len(window)] = latent
    return Schedule(fidx, obs_m, lat_m, scat, video_length, max_frames)


def _window_model_fn(
    model, variables, diffusion, x0, obs_mask, latent_mask, frame_indices,
    observed_frames, use_gradient_method,
):
    kinda = jnp.zeros_like(obs_mask)
    return make_video_model_fn(
        model,
        variables,
        diffusion,
        x0=x0,
        obs_mask=obs_mask,
        latent_mask=latent_mask,
        kinda_marg_mask=kinda,
        frame_indices=frame_indices,
        observed_frames=observed_frames,
        disable_obs_conditioning=use_gradient_method,
    )


def _denoise_window(
    model,
    variables,
    diffusion,
    x0,
    obs_mask,
    latent_mask,
    frame_indices,
    rng,
    *,
    observed_frames="x_0",
    clip_denoised=True,
    use_gradient_method=False,
    regenerate_cond=False,
):
    """Run the full reverse process on one window, starting from x0
    (reference video_sample.py:150-168). Returns the final window."""
    B = x0.shape[0]
    model_fn = _window_model_fn(
        model, variables, diffusion, x0, obs_mask, latent_mask, frame_indices,
        observed_frames, use_gradient_method,
    )
    ts = jnp.arange(diffusion.num_timesteps - 1, -1, -1)

    def body(carry, i):
        x, rng = carry
        rng, srng, crng = jax.random.split(rng, 3)
        t = jnp.full((B,), i, dtype=jnp.int32)
        if use_gradient_method:
            out = diffusion.p_sample_with_gradient_guidance(
                model_fn,
                x,
                t,
                srng,
                obs_mask=obs_mask,
                x_t_minus_1=x0,
                clip_denoised=clip_denoised,
            )
        else:
            fn = (
                (lambda xx, tt: model_fn(xx, tt, rng=crng))
                if regenerate_cond
                else model_fn
            )
            out = diffusion.p_sample(fn, x, t, srng, clip_denoised=clip_denoised)
        return (out["sample"], rng), None

    (x, _), _ = jax.lax.scan(body, (x0, rng), ts)
    return x


def sample_video(
    model,
    variables,
    diffusion,
    schedule: Schedule,
    batch,
    obs_length,
    rng,
    *,
    observed_frames="x_0",
    clip_denoised=True,
    use_gradient_method=False,
    goal_directed=False,
):
    """Fully-jitted rollout over a compiled schedule.

    :param batch: (B, T, H, W, C) ground-truth videos in [-1, 1] (only the
        observed prefix — and frame T-5 for goal-directed modes — is used).
    :return: (B, T, H, W, C) samples in [-1, 1].
    """
    B, T = batch.shape[:2]
    assert T == schedule.video_length
    samples = jnp.zeros((B, T + 1) + batch.shape[2:], dtype=jnp.float32)
    samples = samples.at[:, :obs_length].set(batch[:, :obs_length])
    if goal_directed:
        # reference fills only frame -5 with ground truth (video_sample.py:72)
        samples = samples.at[:, T - 5].set(batch[:, T - 5])

    tables = (
        jnp.asarray(schedule.frame_indices),
        jnp.asarray(schedule.obs_mask),
        jnp.asarray(schedule.latent_mask),
        jnp.asarray(schedule.scatter_indices),
    )

    def outer(carry, step):
        samples, rng = carry
        fidx, obs_m, lat_m, scat = step
        rng, wrng = jax.random.split(rng)
        # keep the scratch row clean so padded window slots gather zeros
        samples = samples.at[:, T].set(0.0)
        x0 = jnp.take(samples, fidx, axis=1)  # (B, F, H, W, C)
        e = (1, 1, 1)
        F = schedule.max_frames
        obs_mask = jnp.broadcast_to(obs_m.reshape(1, F, *e), (B, F, *e))
        latent_mask = jnp.broadcast_to(lat_m.reshape(1, F, *e), (B, F, *e))
        frame_indices = jnp.broadcast_to(fidx[None], (B, F))
        local = _denoise_window(
            model, variables, diffusion, x0, obs_mask, latent_mask,
            frame_indices, wrng,
            observed_frames=observed_frames,
            clip_denoised=clip_denoised,
            use_gradient_method=use_gradient_method,
        )
        # scatter latent slots back; non-latent slots target the scratch row
        samples = samples.at[:, scat].set(local)
        return (samples, rng), None

    (samples, _), _ = jax.lax.scan(outer, (samples, rng), tables)
    return samples[:, :T]


def sample_video_adaptive(
    model,
    variables,
    diffusion,
    strategy,
    batch,
    obs_length,
    rng,
    *,
    observed_frames="x_0",
    clip_denoised=True,
    use_gradient_method=False,
    jit_window=True,
):
    """Host-in-the-loop rollout for adaptive strategies: the strategy inspects
    generated content between inference steps; each window runs as one jitted
    computation (shapes are constant, so it compiles once)."""
    B, T = batch.shape[:2]
    max_frames = strategy._max_frames
    samples = np.zeros((B, T) + batch.shape[2:], dtype=np.float32)
    samples[:, :obs_length] = np.asarray(batch[:, :obs_length])

    def window_fn(x0, obs_mask, latent_mask, frame_indices, wrng):
        return _denoise_window(
            model, variables, diffusion, x0, obs_mask, latent_mask,
            frame_indices, wrng,
            observed_frames=observed_frames,
            clip_denoised=clip_denoised,
            use_gradient_method=use_gradient_method,
        )

    if jit_window:
        window_fn = jax.jit(window_fn)

    strategy.set_videos(samples)
    it = iter(strategy)
    while True:
        strategy.set_videos(samples)
        try:
            obs_idx, lat_idx = next(it)
        except StopIteration:
            break
        # per-element windows (obs differs per batch element)
        obs_idx = np.asarray(obs_idx)  # (B, n_obs) or (B, 0)
        lat_idx = np.asarray(lat_idx)  # (B, n_lat)
        if obs_idx.ndim == 1:
            obs_idx = np.tile(obs_idx[None], (B, 1))
        if lat_idx.ndim == 1:
            lat_idx = np.tile(lat_idx[None], (B, 1))
        window = np.concatenate([obs_idx, lat_idx], axis=1).astype(np.int32)
        n_obs, n = obs_idx.shape[1], window.shape[1]
        F = max_frames
        fidx = np.zeros((B, F), dtype=np.int32)
        fidx[:, :n] = window
        x0 = np.stack([samples[b, fidx[b]] for b in range(B)])
        e = (1, 1, 1)
        obs_mask = np.zeros((B, F, *e), dtype=np.float32)
        obs_mask[:, :n_obs] = 1.0
        latent_mask = np.zeros((B, F, *e), dtype=np.float32)
        latent_mask[:, n_obs:n] = 1.0
        rng, wrng = jax.random.split(rng)
        local = np.asarray(
            window_fn(
                jnp.asarray(x0),
                jnp.asarray(obs_mask),
                jnp.asarray(latent_mask),
                jnp.asarray(fidx),
                wrng,
            )
        )
        for b in range(B):
            samples[b, lat_idx[b]] = local[b, n_obs:n]
    return samples
