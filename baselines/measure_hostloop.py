"""Same-silicon baseline: run THIS framework's flagship model in the
REFERENCE's dispatch pattern and compare against the fused rollout on the
same TPU chip.

The reference's sampling hot path (/root/reference/scripts/video_sample.py:
150-168 + gaussian_diffusion.py:403) issues one synchronous device call per
(window x diffusion-timestep) from a Python loop, and assembles each window's
inputs (x0 gather, masks, frame indices) on the host between windows
(video_sample.py:104-146). This script reproduces exactly that execution
structure with our model:

  * windows processed sequentially (no cross-window batching),
  * per-timestep `p_sample` as an individually jitted device call driven
    from Python,
  * host round trip (numpy materialisation) of the samples buffer at every
    window boundary for the gather/scatter.

Everything else (model, diffusion math, respacing, dtype policy, chip) is
identical to bench.py, so fused_fps / hostloop_fps isolates the *software
architecture* win — no hardware mixing.

Writes baselines/hostloop_bench.json and prints one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import inspect

    import jax
    import jax.numpy as jnp

    import video_diffusion_tpu.utils  # noqa: F401  (compilation cache)
    from video_diffusion_tpu.models import factory
    from video_diffusion_tpu.models.wrappers import make_video_model_fn
    from video_diffusion_tpu.sampling import compile_schedule
    from video_diffusion_tpu.sampling.strategies import inference_strategies

    # identical flagship config to bench.py
    T, size, max_frames, step_size, obs_length = 30, 64, 20, 7, 2
    B = int(os.environ.get("BENCH_BATCH", "8"))
    respace = os.environ.get("BENCH_RESPACE", "ddim250")
    # HOSTLOOP_SYNC=1: block on every p_sample (frameworks that synchronise
    # per step); HOSTLOOP_FP32=1: fp32 compute like the reference's sampler
    # (no autocast in its p_sample loop)
    sync = os.environ.get("HOSTLOOP_SYNC", "0") == "1"
    fp32 = os.environ.get("HOSTLOOP_FP32", "0") == "1"

    defaults = factory.video_model_and_diffusion_defaults()
    defaults.update(
        T=T, image_size=size, num_channels=128, num_res_blocks=2, num_heads=4,
        attention_resolutions="16,8", rp_alpha=T, rp_beta=T, rp_gamma=T,
        diffusion_steps=1000, timestep_respacing=respace,
    )
    sig = inspect.signature(factory.create_video_model_and_diffusion)
    kwargs = {k: defaults[k] for k in sig.parameters if k in defaults}
    model, diffusion = factory.create_video_model_and_diffusion(
        **kwargs, use_bf16=not fp32
    )

    rng = jax.random.PRNGKey(0)
    batch = jax.random.uniform(rng, (B, T, size, size, 3), minval=-1, maxval=1)

    e = (1, 1, 1)
    F = max_frames
    x_init = batch[:1, :F]
    masks0 = jnp.zeros((1, F, *e))
    fi0 = jnp.broadcast_to(jnp.arange(F)[None], (1, F))
    t0 = jnp.zeros((1,), dtype=jnp.int32)
    init = jax.jit(
        lambda r: model.init(
            {"params": r},
            x_init, diffusion.scale_timesteps(t0),
            x0=x_init, obs_mask=masks0, latent_mask=1 - masks0,
            kinda_marg_mask=masks0, frame_indices=fi0, observed_frames="x_0",
        )
    )
    variables = init(jax.random.PRNGKey(1))

    strategy = inference_strategies["independent"](
        video_length=T, num_obs=obs_length, max_frames=max_frames,
        step_size=step_size,
    )
    schedule = compile_schedule(iter(strategy), max_frames, T)

    timesteps = list(range(diffusion.num_timesteps))[::-1]

    # one p_sample per (window, timestep), params/masks as arguments —
    # the reference's per-call granularity (video_sample.py:150-168)
    def one_step(v, x0_win, obs_m, lat_m, marg_m, fidx, x, t, r):
        model_fn = make_video_model_fn(
            model, v, diffusion, x0=x0_win, obs_mask=obs_m, latent_mask=lat_m,
            kinda_marg_mask=marg_m, frame_indices=fidx, observed_frames="x_0",
        )
        tt = jnp.full((x.shape[0],), t, dtype=jnp.int32)
        out = diffusion.p_sample(model_fn, x, tt, r)
        # splice observed frames back like the reference's per-step loop
        return out["sample"] * lat_m + x0_win * (1 - lat_m)

    step_fn = jax.jit(one_step, static_argnames=())

    def rollout():
        samples = np.zeros((B, T + 1) + batch.shape[2:], dtype=np.float32)
        samples[:, :obs_length] = np.asarray(batch[:, :obs_length])
        key = jax.random.PRNGKey(42)
        for seg in schedule.segments:
            S, Fw = seg.frame_indices.shape
            for s in range(S):  # windows sequentially, like the reference
                fidx = seg.frame_indices[s]
                # host-side window assembly (reference video_sample.py:104-146)
                x0_win = jnp.asarray(samples[:, fidx])
                obs_m = jnp.broadcast_to(
                    jnp.asarray(seg.obs_mask[s].reshape(1, Fw, *e),
                                dtype=jnp.float32),
                    (B, Fw, *e),
                )
                lat_m = jnp.broadcast_to(
                    jnp.asarray(seg.latent_mask[s].reshape(1, Fw, *e),
                                dtype=jnp.float32),
                    (B, Fw, *e),
                )
                marg_m = jnp.zeros_like(obs_m)
                fidx_dev = jnp.broadcast_to(jnp.asarray(fidx)[None], (B, Fw))
                key, nk = jax.random.split(key)
                x = jax.random.normal(nk, x0_win.shape, dtype=jnp.float32)
                x = x * lat_m + x0_win * (1 - lat_m)
                for t in timesteps:
                    key, sk = jax.random.split(key)
                    x = step_fn(
                        variables, x0_win, obs_m, lat_m, marg_m, fidx_dev,
                        x, t, sk,
                    )
                    if sync:
                        x.block_until_ready()
                # host scatter at the window boundary (forces the round trip)
                x_host = np.asarray(x)
                lat_rows = seg.latent_mask[s] > 0
                samples[:, fidx[lat_rows]] = x_host[:, lat_rows]
        return samples[:, :T]

    # compile + warmup (one full rollout compiles every (t,) variant once)
    t_warm = time.perf_counter()
    rollout()
    warm_s = time.perf_counter() - t_warm

    n_iters = int(os.environ.get("BENCH_ITERS", "1"))
    t0_ = time.perf_counter()
    for _ in range(n_iters):
        rollout()
    dt = (time.perf_counter() - t0_) / n_iters

    frames_generated = B * (T - obs_length)
    n_chips = jax.local_device_count()
    fps = frames_generated / dt / n_chips

    out = {
        "metric": "hostloop_frames_per_sec_per_chip",
        "value": round(fps, 4),
        "unit": "frames/sec/chip (reference dispatch pattern, same chip)",
        "config": {"B": B, "T": T, "size": size, "respace": respace,
                   "max_frames": max_frames, "step_size": step_size,
                   "sync": sync, "fp32": fp32},
        "warmup_s": round(warm_s, 1),
        "seconds_per_rollout": round(dt, 2),
    }
    name = "hostloop_bench" + ("_sync" if sync else "") + ("_fp32" if fp32 else "")
    path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), f"{name}.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
