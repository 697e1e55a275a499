"""Benchmark: frames/sec/chip for BAIR-style 64x64 video sampling, DDIM-250.

Prints ONE JSON line:
  {"metric": "frames_per_sec_per_chip", "value": N,
   "unit": "frames/sec/chip (BAIR 64x64, independent s7, DDIM-250)",
   "vs_baseline": N}

Measures the driver's north-star configuration (BASELINE.json config #3):
BAIR robot-pushing-shaped videos (T=30, 64x64), 'independent' inference mode
with step_size=7, max_frames=20-frame windows, 250 respaced diffusion steps,
flagship model size (128 channels, 2 res blocks — the reference's defaults).
The model is randomly initialized (throughput does not depend on weights);
videos counted are finalized output frames (T - obs_length per video).

vs_baseline divides by the PyTorch reference's frames/sec measured on this
host (see baselines/measure_reference.py -> baselines/reference_bench.json).
If that file is absent, vs_baseline is null.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import inspect

    import jax
    import jax.numpy as jnp

    os.environ.setdefault("VDT_PALLAS_ATTN", "1")  # fused attention (inference)
    # hardware-friendly PRNG for the per-step sampler noise: same normal
    # distribution, different stream than threefry (fixed-seed outputs
    # differ; parity/golden tests pin threefry — see utils/jax_setup.py)
    os.environ.setdefault("VDT_PRNG", "rbg")

    import video_diffusion_tpu.utils  # noqa: F401  (compilation cache)
    from video_diffusion_tpu.models import factory
    from video_diffusion_tpu.sampling import compile_schedule
    from video_diffusion_tpu.sampling.sampler import (
        sample_video_windows_parallel,
    )
    from video_diffusion_tpu.sampling.strategies import inference_strategies

    T, size, max_frames, step_size, obs_length = 30, 64, 20, 7, 2
    B = int(os.environ.get("BENCH_BATCH", "8"))
    respace = os.environ.get("BENCH_RESPACE", "ddim250")

    defaults = factory.video_model_and_diffusion_defaults()
    defaults.update(
        T=T, image_size=size, num_channels=128, num_res_blocks=2, num_heads=4,
        attention_resolutions="16,8", rp_alpha=T, rp_beta=T, rp_gamma=T,
        diffusion_steps=1000, timestep_respacing=respace,
    )
    sig = inspect.signature(factory.create_video_model_and_diffusion)
    kwargs = {k: defaults[k] for k in sig.parameters if k in defaults}
    model, diffusion = factory.create_video_model_and_diffusion(
        **kwargs, use_bf16=True
    )

    rng = jax.random.PRNGKey(0)
    batch = jax.random.uniform(rng, (B, T, size, size, 3), minval=-1, maxval=1)

    # init params (jitted: eager op dispatch is slow on this host)
    e = (1, 1, 1)
    F = max_frames
    x = batch[:1, :F]
    masks = jnp.zeros((1, F, *e))
    fi = jnp.broadcast_to(jnp.arange(F)[None], (1, F))
    t = jnp.zeros((1,), dtype=jnp.int32)
    init = jax.jit(
        lambda r: model.init(
            {"params": r},
            x, diffusion.scale_timesteps(t),
            x0=x, obs_mask=masks, latent_mask=1 - masks, kinda_marg_mask=masks,
            frame_indices=fi, observed_frames="x_0",
        )
    )
    variables = init(jax.random.PRNGKey(1))

    strategy = inference_strategies["independent"](
        video_length=T, num_obs=obs_length, max_frames=max_frames,
        step_size=step_size,
    )
    schedule = compile_schedule(iter(strategy), max_frames, T)

    # 'independent' windows never condition on generated frames -> all
    # windows denoise concurrently in one batched reverse process (the
    # program also contains the model exactly once, which keeps the HLO
    # small). Params cross the jit boundary as arguments — closure capture
    # would embed them as constants and overflow the remote-compile tunnel.
    # BENCH_T_CHUNK splits the timestep scan into chunks of that many steps,
    # each its own device call: required for configs whose single fused
    # execution would exceed the remote tunnel's ~60s per-call deadline
    # (B>10 at DDIM-250 — see BENCH.md), at a few host dispatches of cost.
    t_chunk = int(os.environ.get("BENCH_T_CHUNK", "0"))
    if t_chunk:
        fn = lambda v, b, r: sample_video_windows_parallel(  # noqa: E731
            model, v, diffusion, schedule, b, obs_length, r, t_chunk=t_chunk
        )
    else:
        fn = jax.jit(
            lambda v, b, r: sample_video_windows_parallel(
                model, v, diffusion, schedule, b, obs_length, r
            )
        )
    # compile + warmup
    out = fn(variables, batch, jax.random.PRNGKey(2))
    out.block_until_ready()

    profile_dir = os.environ.get("VDT_PROFILE_DIR", "")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    n_iters = int(os.environ.get("BENCH_ITERS", "3"))
    t0 = time.perf_counter()
    for i in range(n_iters):
        out = fn(variables, batch, jax.random.PRNGKey(3 + i))
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / n_iters
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"# profiler trace -> {profile_dir}", file=sys.stderr)

    frames_generated = B * (T - obs_length)
    n_chips = jax.local_device_count()
    fps = frames_generated / dt / n_chips

    vs_baseline = None
    ref_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "baselines", "reference_bench.json",
    )
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)
        if ref.get("frames_per_sec"):
            vs_baseline = fps / ref["frames_per_sec"]

    print(json.dumps({
        "metric": "frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": (
            "frames/sec/chip (BAIR 64x64, independent s7, DDIM-250); "
            "vs_baseline = ratio over the torch fp32 reference on a "
            "1-core host CPU (baselines/reference_bench.json), NOT "
            "equivalent silicon"
        ),
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
