"""Device-resident long-video sampling.

The reference drives every (inference-step × diffusion-timestep) pair as a
synchronous GPU round trip from Python (video_sample.py:150-168). Here the
whole rollout runs on device:

* a non-adaptive strategy is compiled into static index/mask tables
  (``compile_schedule``). Windows vary in width between inference steps
  (obs+latent counts change), so consecutive steps with the same window width
  are grouped into a *segment*; each segment is one ``lax.scan`` over its
  steps (with an inner scan over diffusion timesteps). A rollout is a handful
  of sequential scans — typically 2 (the bootstrap window + the steady-state
  window) — with zero host round trips in between.
  NO window padding is used: padded slots would perturb the temporal
  attention pre-norm statistics (which pool over the frame axis, reference
  unet.py:471-475), so windows are exactly [obs..., latent...] like the
  reference's inference path (video_sample.py:119-132);
* adaptive (content-dependent) strategies use the host-in-the-loop
  ``sample_video_adaptive`` — one jitted window computation per inference
  step (not per diffusion step).

Reference window semantics kept exactly: the inner loop starts from x0 (NOT
fresh noise — video_sample.py:150); obs slots are respliced by the CondMarg
model each step and only latent slots are scattered back
(video_sample.py:184-189).
"""

import warnings
import collections
import os
from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.wrappers import make_video_model_fn


def _state_dtype():
    """Reverse-scan carry dtype (``VDT_SAMPLE_DTYPE`` = ``f32`` default |
    ``bf16``).

    The per-timestep elementwise passes of the rollout (carry read/write,
    sampler noise, posterior splice) are HBM-bound full-video-tensor
    fusions — 9.6% of device time at f32 (BENCH.md profile). bf16 halves
    their bytes: the scan carry and the per-step normal draw are stored in
    bf16 while every coefficient multiply still promotes to f32 inside the
    fusion (the f32 coefficient tables force the promotion), so only the
    HBM representation narrows, not the arithmetic. NOT bit-identical to
    f32 — opt-in, A/B'd in BENCH.md; the final window is cast back to f32
    before it is spliced into the sample buffer.

    Read per rollout call on the host; the chunk-runner cache keys on the
    resolved value so an env change between calls re-keys correctly.
    """
    mode = os.environ.get("VDT_SAMPLE_DTYPE", "f32")
    return jnp.bfloat16 if mode == "bf16" else jnp.float32


@dataclass(frozen=True)
class Segment:
    """A run of consecutive inference steps sharing one window width F.

    frame_indices[s, f]   — gather index into the samples buffer
    obs_mask[s, f]        — 1 where slot f of step s is observed
    latent_mask[s, f]     — 1 where slot f is generated this step
    scatter_indices[s, f] — write index for slot f (video_length = discard)
    """

    frame_indices: np.ndarray
    obs_mask: np.ndarray
    latent_mask: np.ndarray
    scatter_indices: np.ndarray


@dataclass(frozen=True)
class Schedule:
    segments: Tuple[Segment, ...]
    video_length: int
    max_frames: int

    @property
    def num_steps(self):
        return sum(len(s.frame_indices) for s in self.segments)

    @property
    def steps(self):
        """Flat [(obs_indices, latent_indices)] view for inspection."""
        out = []
        for seg in self.segments:
            for s in range(len(seg.frame_indices)):
                obs = seg.frame_indices[s][seg.obs_mask[s] > 0].tolist()
                lat = seg.frame_indices[s][seg.latent_mask[s] > 0].tolist()
                out.append((obs, lat))
        return out


def compile_schedule(strategy_iter, max_frames, video_length) -> Schedule:
    """Run a (non-adaptive) strategy iterator to exhaustion and pack its steps
    into per-window-width segments of static tables."""
    steps = list(strategy_iter)
    T = video_length
    segments: List[Segment] = []
    run: List[tuple] = []

    def flush():
        if not run:
            return
        S, F = len(run), len(run[0][0]) + len(run[0][1])
        fidx = np.zeros((S, F), dtype=np.int32)
        obs_m = np.zeros((S, F), dtype=np.float32)
        lat_m = np.zeros((S, F), dtype=np.float32)
        scat = np.full((S, F), T, dtype=np.int32)
        for s, (obs, latent) in enumerate(run):
            window = list(obs) + list(latent)
            fidx[s] = window
            obs_m[s, : len(obs)] = 1.0
            lat_m[s, len(obs):] = 1.0
            scat[s, len(obs):] = latent
        segments.append(Segment(fidx, obs_m, lat_m, scat))
        run.clear()

    for obs, latent in steps:
        width = len(obs) + len(latent)
        assert width > 0, (obs, latent)
        if width > max_frames:
            # The reference's strategies can overflow max_frames (e.g.
            # ExpPast's exponential set is log2(t) obs frames BEFORE the
            # fill-to-max loop, reference inference_util.py:280-292, so
            # log2(t)+step_size can exceed small max_frames) and the
            # reference feeds the oversized window to the model anyway.
            # Mirror that: it is just another (wider) segment here.
            warnings.warn(
                f"inference window of {width} frames exceeds max_frames="
                f"{max_frames} (reference-compatible; the model sees a "
                "wider window than it was trained on)",
                stacklevel=2,
            )
        if run and width != len(run[0][0]) + len(run[0][1]):
            flush()
        run.append((list(obs), list(latent)))
    flush()
    return Schedule(tuple(segments), video_length, max_frames)


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
    sd = _state_dtype()
    # x0 is loop-invariant conditioning re-read by the splice every timestep;
    # at bf16 state dtype, narrow it once here (the model casts it to the
    # compute dtype anyway) instead of reading f32 from HBM K times. The
    # gradient-guidance path keeps the f32 x0 (its mismatch is f32 math).
    x0m = x0 if (sd == jnp.float32 or use_gradient_method) else x0.astype(sd)
    model_fn = _window_model_fn(
        model, variables, diffusion, x0m, obs_mask, latent_mask, frame_indices,
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
        return (out["sample"].astype(sd), rng), None

    (x, _), _ = jax.lax.scan(body, (x0.astype(sd), rng), ts)
    return x.astype(x0.dtype)


# Chunk runners memoised per (model, diffusion, flags): a fresh jax.jit per
# rollout would retrace every call. Keyed on object ids; every entry PINS
# its model/diffusion (strong refs in the value), so a live entry's ids can
# never be reused by CPython and a stale runner can never alias a new
# object. Bounded LRU so long-lived processes that rebuild models don't
# accumulate runners (and their pinned objects) forever.
_CHUNK_RUNNERS = collections.OrderedDict()  # key -> (runner, model, diffusion)
_CHUNK_RUNNERS_MAX = 32


def _get_chunk_runner(model, diffusion, observed_frames, clip_denoised,
                      use_gradient_method, regenerate_cond,
                      state_dtype=jnp.float32):
    key = (
        id(model), id(diffusion), observed_frames, clip_denoised,
        use_gradient_method, regenerate_cond, jnp.dtype(state_dtype).name,
    )
    if key in _CHUNK_RUNNERS:
        _CHUNK_RUNNERS.move_to_end(key)
        return _CHUNK_RUNNERS[key][0]

    @jax.jit
    def run(variables, x0, obs_mask, latent_mask, frame_indices, x, rng, ts):
        B = x0.shape[0]
        x0m = (
            x0
            if (state_dtype == jnp.float32 or use_gradient_method)
            else x0.astype(state_dtype)
        )
        model_fn = _window_model_fn(
            model, variables, diffusion, x0m, obs_mask, latent_mask,
            frame_indices, observed_frames, use_gradient_method,
        )

        def body(carry, i):
            x, rng = carry
            rng, srng, crng = jax.random.split(rng, 3)
            t = jnp.full((B,), i, dtype=jnp.int32)
            if use_gradient_method:
                out = diffusion.p_sample_with_gradient_guidance(
                    model_fn, x, t, srng, obs_mask=obs_mask, x_t_minus_1=x0,
                    clip_denoised=clip_denoised,
                )
            else:
                fn = (
                    (lambda xx, tt: model_fn(xx, tt, rng=crng))
                    if regenerate_cond
                    else model_fn
                )
                out = diffusion.p_sample(fn, x, t, srng,
                                         clip_denoised=clip_denoised)
            return (out["sample"].astype(state_dtype), rng), None

        (x2, rng2), _ = jax.lax.scan(body, (x.astype(state_dtype), rng), ts)
        return x2, rng2

    _CHUNK_RUNNERS[key] = (run, model, diffusion)
    while len(_CHUNK_RUNNERS) > _CHUNK_RUNNERS_MAX:
        _CHUNK_RUNNERS.popitem(last=False)
    return run


def _denoise_window_chunked(
    model, variables, diffusion, x0, obs_mask, latent_mask, frame_indices,
    rng, t_chunk, *, observed_frames="x_0", clip_denoised=True,
    use_gradient_method=False, regenerate_cond=False,
):
    """_denoise_window split into ceil(K / t_chunk) device calls.

    The single-scan rollout is one device execution of
    O(num_timesteps x model) — on remote-execution setups with a per-call
    deadline (this image's tunnel kills executions over ~60s; see BENCH.md
    'batch > 8'), long scans die as opaque device errors. Chunking carries
    (x, rng) across smaller scans; the rng stream and arithmetic are
    IDENTICAL to the single scan (parity-tested), at a few host dispatches
    per window.
    """
    runner = _get_chunk_runner(
        model, diffusion, observed_frames, clip_denoised, use_gradient_method,
        regenerate_cond, state_dtype=_state_dtype(),
    )
    K = diffusion.num_timesteps
    ts_full = jnp.arange(K - 1, -1, -1)
    # pre-cast so every chunk call sees the same carry dtype (one trace)
    x = x0.astype(_state_dtype())
    for lo in range(0, K, t_chunk):
        x, rng = runner(
            variables, x0, obs_mask, latent_mask, frame_indices, x, rng,
            ts_full[lo : lo + t_chunk],
        )
    return x.astype(x0.dtype)


def _bcast_masks(obs_m, lat_m, fidx, B):
    e = (1, 1, 1)
    F = obs_m.shape[-1]
    obs_mask = jnp.broadcast_to(obs_m.reshape(1, F, *e), (B, F, *e))
    latent_mask = jnp.broadcast_to(lat_m.reshape(1, F, *e), (B, F, *e))
    frame_indices = jnp.broadcast_to(fidx[None], (B, F))
    return obs_mask, latent_mask, frame_indices


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
    t_chunk=None,
):
    """Rollout over a compiled schedule: one lax.scan per segment, all on
    device.

    :param batch: (B, T, H, W, C) ground-truth videos in [-1, 1] (only the
        observed prefix — and frame T-5 for goal-directed modes — is used).
    :param t_chunk: when set, run windows host-side with the reverse scan
        split into t_chunk-step device calls (same rng stream — bit-identical
        output; for remote-execution per-call deadlines, see BENCH.md).
    :return: (B, T, H, W, C) samples in [-1, 1].
    """
    B, T = batch.shape[:2]
    assert T == schedule.video_length
    samples = jnp.zeros((B, T + 1) + batch.shape[2:], dtype=jnp.float32)
    samples = samples.at[:, :obs_length].set(batch[:, :obs_length])
    if goal_directed:
        # reference fills only frame -5 with ground truth (video_sample.py:72)
        samples = samples.at[:, T - 5].set(batch[:, T - 5])

    if t_chunk:
        for seg in schedule.segments:
            for s in range(seg.frame_indices.shape[0]):
                fidx = jnp.asarray(seg.frame_indices[s])
                rng, wrng = jax.random.split(rng)
                x0 = jnp.take(samples, fidx, axis=1)
                obs_mask, latent_mask, frame_indices = _bcast_masks(
                    jnp.asarray(seg.obs_mask[s]),
                    jnp.asarray(seg.latent_mask[s]), fidx, B,
                )
                local = _denoise_window_chunked(
                    model, variables, diffusion, x0, obs_mask, latent_mask,
                    frame_indices, wrng, t_chunk,
                    observed_frames=observed_frames,
                    clip_denoised=clip_denoised,
                    use_gradient_method=use_gradient_method,
                )
                samples = samples.at[
                    :, jnp.asarray(seg.scatter_indices[s])
                ].set(local)
        return samples[:, :T]

    for seg in schedule.segments:
        tables = (
            jnp.asarray(seg.frame_indices),
            jnp.asarray(seg.obs_mask),
            jnp.asarray(seg.latent_mask),
            jnp.asarray(seg.scatter_indices),
        )

        def outer(carry, step):
            samples, rng = carry
            fidx, obs_m, lat_m, scat = step
            rng, wrng = jax.random.split(rng)
            x0 = jnp.take(samples, fidx, axis=1)  # (B, F, H, W, C)
            obs_mask, latent_mask, frame_indices = _bcast_masks(
                obs_m, lat_m, fidx, B
            )
            local = _denoise_window(
                model, variables, diffusion, x0, obs_mask, latent_mask,
                frame_indices, wrng,
                observed_frames=observed_frames,
                clip_denoised=clip_denoised,
                use_gradient_method=use_gradient_method,
            )
            # scatter latent slots back; obs slots target the scratch row
            samples = samples.at[:, scat].set(local)
            return (samples, rng), None

        (samples, rng), _ = jax.lax.scan(outer, (samples, rng), tables)
    return samples[:, :T]


def sample_video_horizontal(
    model,
    variables,
    diffusion,
    schedule: Schedule,
    batch,
    obs_length,
    rng,
    *,
    vertical_steps=0,
    observed_frames="x_0",
    clip_denoised=True,
    use_gradient_method=False,
    goal_directed=False,
):
    """'Horizontal' sampling order (reference scripts/video_sample_full.py):
    the outer loop runs over diffusion timesteps and the inner loop over the
    full frame schedule, so every window stays at the same noise level; an
    optional 'vertical' prefix runs the first ``vertical_steps`` timesteps in
    the normal per-window order first."""
    B, T = batch.shape[:2]
    assert T == schedule.video_length
    samples = jnp.zeros((B, T + 1) + batch.shape[2:], dtype=jnp.float32)
    samples = samples.at[:, :obs_length].set(batch[:, :obs_length])
    if goal_directed:
        samples = samples.at[:, T - 5].set(batch[:, T - 5])
    # x_t / x_t_minus_1 conditioning content must be regenerated at every
    # timestep from fresh noise (reference gaussian_diffusion.py:565-582);
    # with x_0 the placeholder cond is used and no rng is consumed.
    regenerate_cond = observed_frames != "x_0"

    def seg_tables(seg):
        return (
            jnp.asarray(seg.frame_indices),
            jnp.asarray(seg.obs_mask),
            jnp.asarray(seg.latent_mask),
            jnp.asarray(seg.scatter_indices),
        )

    # --- vertical prefix: per-window descent over the first K timesteps ---
    if vertical_steps > 0:
        ts_v = jnp.arange(
            diffusion.num_timesteps - 1,
            diffusion.num_timesteps - 1 - vertical_steps,
            -1,
        )
        for seg in schedule.segments:

            def v_outer(carry, step):
                samples, rng = carry
                fidx, obs_m, lat_m, scat = step
                x0 = jnp.take(samples, fidx, axis=1)
                obs_mask, latent_mask, frame_indices = _bcast_masks(
                    obs_m, lat_m, fidx, B
                )
                model_fn = _window_model_fn(
                    model, variables, diffusion, x0, obs_mask, latent_mask,
                    frame_indices, observed_frames, use_gradient_method,
                )

                def v_inner(carry2, i):
                    x, rng = carry2
                    rng, srng, crng = jax.random.split(rng, 3)
                    t = jnp.full((B,), i, dtype=jnp.int32)
                    fn = (
                        (lambda xx, tt: model_fn(xx, tt, rng=crng))
                        if regenerate_cond
                        else model_fn
                    )
                    out = diffusion.p_sample(
                        fn, x, t, srng, clip_denoised=clip_denoised
                    )
                    return (out["sample"], rng), None

                rng, wrng = jax.random.split(rng)
                (x, _), _ = jax.lax.scan(v_inner, (x0, wrng), ts_v)
                samples = samples.at[:, scat].set(x)
                return (samples, rng), None

            (samples, rng), _ = jax.lax.scan(
                v_outer, (samples, rng), seg_tables(seg)
            )

    # --- horizontal phase: all windows descend one timestep together ------
    ts_h = jnp.arange(diffusion.num_timesteps - 1 - vertical_steps, -1, -1)

    def h_outer(carry, t_scalar):
        samples, rng = carry
        for seg in schedule.segments:

            def h_inner(carry2, step):
                samples, rng = carry2
                fidx, obs_m, lat_m, scat = step
                rng, wrng, crng = jax.random.split(rng, 3)
                x0 = jnp.take(samples, fidx, axis=1)
                obs_mask, latent_mask, frame_indices = _bcast_masks(
                    obs_m, lat_m, fidx, B
                )
                model_fn = _window_model_fn(
                    model, variables, diffusion, x0, obs_mask, latent_mask,
                    frame_indices, observed_frames, use_gradient_method,
                )
                t = jnp.full((B,), t_scalar, dtype=jnp.int32)
                if use_gradient_method:
                    out = diffusion.p_sample_with_gradient_guidance(
                        model_fn, x0, t, wrng, obs_mask=obs_mask,
                        x_t_minus_1=x0, clip_denoised=clip_denoised,
                    )
                else:
                    fn = (
                        (lambda xx, tt: model_fn(xx, tt, rng=crng))
                        if regenerate_cond
                        else model_fn
                    )
                    out = diffusion.p_sample(
                        fn, x0, t, wrng, clip_denoised=clip_denoised
                    )
                samples = samples.at[:, scat].set(out["sample"])
                return (samples, rng), None

            (samples, rng), _ = jax.lax.scan(
                h_inner, (samples, rng), seg_tables(seg)
            )
        return (samples, rng), None

    (samples, _), _ = jax.lax.scan(h_outer, (samples, rng), ts_h)
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
    t_chunk=None,
):
    """Host-in-the-loop rollout for adaptive strategies: the strategy inspects
    generated content between inference steps; each distinct window width
    compiles once. ``t_chunk`` (default: the VDT_T_CHUNK env var) splits each
    window's reverse scan into bounded device calls exactly like the
    non-adaptive rollout — same rng stream, bit-identical output — for the
    remote-execution per-call deadline (BENCH.md "Batch > 10")."""
    if t_chunk is None:
        t_chunk = int(os.environ.get("VDT_T_CHUNK", "0")) or None
    B, T = batch.shape[:2]
    samples = np.zeros((B, T) + batch.shape[2:], dtype=np.float32)
    samples[:, :obs_length] = np.asarray(batch[:, :obs_length])

    if t_chunk:
        def window_fn(v, x0, obs_mask, latent_mask, frame_indices, wrng):
            return _denoise_window_chunked(
                model, v, diffusion, x0, obs_mask, latent_mask,
                frame_indices, wrng, t_chunk,
                observed_frames=observed_frames,
                clip_denoised=clip_denoised,
                use_gradient_method=use_gradient_method,
            )
    else:
        def window_fn(v, x0, obs_mask, latent_mask, frame_indices, wrng):
            return _denoise_window(
                model, v, diffusion, x0, obs_mask, latent_mask,
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
        obs_idx = np.asarray(obs_idx)  # (B, n_obs) or (n_obs,)
        lat_idx = np.asarray(lat_idx)
        if obs_idx.ndim == 1:
            obs_idx = np.tile(obs_idx[None], (B, 1))
        if lat_idx.ndim == 1:
            lat_idx = np.tile(lat_idx[None], (B, 1))
        window = np.concatenate([obs_idx, lat_idx], axis=1).astype(np.int32)
        n_obs, F = obs_idx.shape[1], window.shape[1]
        x0 = np.stack([samples[b, window[b]] for b in range(B)])
        e = (1, 1, 1)
        obs_mask = np.zeros((B, F, *e), dtype=np.float32)
        obs_mask[:, :n_obs] = 1.0
        latent_mask = np.zeros((B, F, *e), dtype=np.float32)
        latent_mask[:, n_obs:] = 1.0
        rng, wrng = jax.random.split(rng)
        local = np.asarray(
            window_fn(
                variables,
                jnp.asarray(x0),
                jnp.asarray(obs_mask),
                jnp.asarray(latent_mask),
                jnp.asarray(window),
                wrng,
            )
        )
        for b in range(B):
            samples[b, lat_idx[b]] = local[b, n_obs:]
    return samples


# strategies whose windows never condition on generated frames: every window
# can be denoised concurrently (reference semantics preserved — windows are
# independent by construction, inference_util.py:248-272)
PARALLEL_WINDOW_STRATEGIES = ("independent", "really-independent")


def sample_video_windows_parallel(
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
    t_chunk=None,
):
    """All-windows-at-once rollout for strategies that only condition on the
    originally observed frames ('independent' / 'really-independent'): the S
    windows are folded into the batch axis and denoised in ONE model-batched
    reverse process per segment. Distributionally identical to the sequential
    rollout; throughput scales with chip memory instead of schedule length.
    """
    B, T = batch.shape[:2]
    assert T == schedule.video_length
    samples = jnp.zeros((B, T + 1) + batch.shape[2:], dtype=jnp.float32)
    samples = samples.at[:, :obs_length].set(batch[:, :obs_length])

    # VDT_WINDOW_FOLD caps how many windows fold into one device call
    # (0 = all of them). Peak sampler HBM scales with B x fold, so this
    # bounds memory on the widest-batch path (batch-32 independent needed
    # ~16G with everything folded — NOTES_ROUND4.md) at the cost of one
    # extra compile for a remainder chunk. Windows in a segment never
    # condition on each other, so any fold split is exact.
    fold = int(os.environ.get("VDT_WINDOW_FOLD", "0") or 0)

    for seg in schedule.segments:
        S, F = seg.frame_indices.shape
        step = S if fold <= 0 else min(fold, S)
        for s0 in range(0, S, step):
            fidx_np = seg.frame_indices[s0 : s0 + step]
            Sc = fidx_np.shape[0]
            fidx = jnp.asarray(fidx_np)  # (Sc, F)
            # gather windows from the initial buffer: (B, Sc, F, H, W, C)
            x0 = jnp.take(samples, fidx.reshape(-1), axis=1).reshape(
                (B, Sc, F) + batch.shape[2:]
            )
            x0 = x0.reshape((B * Sc, F) + batch.shape[2:])
            e = (1, 1, 1)
            obs_mask = jnp.broadcast_to(
                jnp.asarray(seg.obs_mask[s0 : s0 + step]).reshape(
                    1, Sc, F, *e
                ),
                (B, Sc, F, *e),
            ).reshape(B * Sc, F, *e)
            latent_mask = jnp.broadcast_to(
                jnp.asarray(seg.latent_mask[s0 : s0 + step]).reshape(
                    1, Sc, F, *e
                ),
                (B, Sc, F, *e),
            ).reshape(B * Sc, F, *e)
            frame_indices = jnp.broadcast_to(
                fidx[None], (B, Sc, F)
            ).reshape(B * Sc, F)
            rng, wrng = jax.random.split(rng)
            if t_chunk:
                local = _denoise_window_chunked(
                    model, variables, diffusion, x0, obs_mask, latent_mask,
                    frame_indices, wrng, t_chunk,
                    observed_frames=observed_frames,
                    clip_denoised=clip_denoised,
                    use_gradient_method=use_gradient_method,
                )
            else:
                local = _denoise_window(
                    model, variables, diffusion, x0, obs_mask, latent_mask,
                    frame_indices, wrng,
                    observed_frames=observed_frames,
                    clip_denoised=clip_denoised,
                    use_gradient_method=use_gradient_method,
                )
            local = local.reshape((B, Sc, F) + batch.shape[2:])
            scat = jnp.asarray(
                seg.scatter_indices[s0 : s0 + step]
            ).reshape(-1)  # (Sc*F,)
            samples = samples.at[:, scat].set(
                local.reshape((B, Sc * F) + batch.shape[2:])
            )
    return samples[:, :T]


def _denoise_window_trajectory(
    model, variables, diffusion, x0, obs_mask, latent_mask, frame_indices, rng,
    *, observed_frames="x_0", clip_denoised=True, use_gradient_method=False,
):
    """Like _denoise_window but also returns the per-timestep window states
    stacked as (K, B, F, H, W, C) — the --save_all_timesteps path
    (reference video_sample.py:148-173)."""
    B = x0.shape[0]
    model_fn = _window_model_fn(
        model, variables, diffusion, x0, obs_mask, latent_mask, frame_indices,
        observed_frames, use_gradient_method,
    )
    ts = jnp.arange(diffusion.num_timesteps - 1, -1, -1)

    def body(carry, i):
        x, rng = carry
        rng, srng = jax.random.split(rng)
        t = jnp.full((B,), i, dtype=jnp.int32)
        if use_gradient_method:
            out = diffusion.p_sample_with_gradient_guidance(
                model_fn, x, t, srng, obs_mask=obs_mask, x_t_minus_1=x0,
                clip_denoised=clip_denoised,
            )
        else:
            out = diffusion.p_sample(model_fn, x, t, srng,
                                     clip_denoised=clip_denoised)
        return (out["sample"], rng), out["sample"]

    (x, _), traj = jax.lax.scan(body, (x0, rng), ts)
    return x, traj


def sample_video_with_trajectory(
    model, variables, diffusion, schedule: Schedule, batch, obs_length, rng,
    *, observed_frames="x_0", clip_denoised=True, use_gradient_method=False,
    goal_directed=False,
):
    """Host-loop rollout that records every timestep of every frame: returns
    (samples (B,T,...), all_timestep_samples (B,K,T,...)). Cold path used by
    --save_all_timesteps; one jit per window width."""
    B, T = batch.shape[:2]
    K = diffusion.num_timesteps
    samples = np.zeros((B, T) + batch.shape[2:], dtype=np.float32)
    samples[:, :obs_length] = np.asarray(batch[:, :obs_length])
    all_ts = np.zeros((B, K, T) + batch.shape[2:], dtype=np.float32)
    all_ts[:, :, :obs_length] = samples[:, None, :obs_length]
    if goal_directed:
        samples[:, T - 5] = np.asarray(batch[:, T - 5])

    fns = {}

    def get_fn(F):
        if F not in fns:
            fns[F] = jax.jit(
                lambda v, x0, om, lm, fi, r: _denoise_window_trajectory(
                    model, v, diffusion, x0, om, lm, fi, r,
                    observed_frames=observed_frames,
                    clip_denoised=clip_denoised,
                    use_gradient_method=use_gradient_method,
                )
            )
        return fns[F]

    for obs_idx, lat_idx in schedule.steps:
        window = list(obs_idx) + list(lat_idx)
        F = len(window)
        x0 = jnp.asarray(samples[:, window])
        e = (1, 1, 1)
        om = np.zeros((B, F, *e), dtype=np.float32)
        om[:, : len(obs_idx)] = 1
        lm = np.zeros((B, F, *e), dtype=np.float32)
        lm[:, len(obs_idx):] = 1
        fi = np.broadcast_to(np.asarray(window, np.int32)[None], (B, F))
        rng, wrng = jax.random.split(rng)
        x, traj = get_fn(F)(
            variables, x0, jnp.asarray(om), jnp.asarray(lm), jnp.asarray(fi),
            wrng,
        )
        x, traj = np.asarray(x), np.asarray(traj)  # traj (K, B, F, ...)
        samples[:, lat_idx] = x[:, len(obs_idx):]
        all_ts[:, :, lat_idx] = np.moveaxis(traj, 0, 1)[:, :, len(obs_idx):]
    return samples, all_ts
