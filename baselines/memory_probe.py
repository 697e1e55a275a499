"""Compile-only HBM accounting for the bench rollout at a given batch size.

Usage: BENCH_BATCH=16 python baselines/memory_probe.py

Compiles (without running) the exact jitted rollout bench.py executes and
prints XLA's memory analysis — used to root-cause the B>8 'TPU device
error' (BENCH.md): if temp+argument+output exceeds the chip's HBM, the
fault is an out-of-memory surfaced opaquely by the remote-execution tunnel.
"""

import inspect
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    os.environ.setdefault("VDT_PALLAS_ATTN", "1")

    import video_diffusion_tpu.utils  # noqa: F401
    from video_diffusion_tpu.models import factory
    from video_diffusion_tpu.sampling import compile_schedule
    from video_diffusion_tpu.sampling.sampler import sample_video_windows_parallel
    from video_diffusion_tpu.sampling.strategies import inference_strategies

    # PROBE_* env knobs override the bench-flagship default so the probe can
    # reproduce other rollout shapes compile-only — e.g. the strategy-eval
    # OOM shape (NOTES_ROUND4.md): PROBE_T=100 PROBE_SIZE=32
    # PROBE_CHANNELS=64 PROBE_MAX_FRAMES=10 PROBE_STEP=5 PROBE_OBS=5
    # BENCH_BATCH=32.
    T = int(os.environ.get("PROBE_T", "30"))
    size = int(os.environ.get("PROBE_SIZE", "64"))
    max_frames = int(os.environ.get("PROBE_MAX_FRAMES", "20"))
    step_size = int(os.environ.get("PROBE_STEP", "7"))
    obs_length = int(os.environ.get("PROBE_OBS", "2"))
    channels = int(os.environ.get("PROBE_CHANNELS", "128"))
    B = int(os.environ.get("BENCH_BATCH", "16"))
    respace = os.environ.get("BENCH_RESPACE", "ddim250")

    defaults = factory.video_model_and_diffusion_defaults()
    defaults.update(
        T=T, image_size=size, num_channels=channels, num_res_blocks=2,
        num_heads=4,
        attention_resolutions="16,8", rp_alpha=T, rp_beta=T, rp_gamma=T,
        diffusion_steps=1000, timestep_respacing=respace,
    )
    sig = inspect.signature(factory.create_video_model_and_diffusion)
    kwargs = {k: defaults[k] for k in sig.parameters if k in defaults}
    model, diffusion = factory.create_video_model_and_diffusion(
        **kwargs, use_bf16=True
    )

    strategy = inference_strategies["independent"](
        video_length=T, num_obs=obs_length, max_frames=max_frames,
        step_size=step_size,
    )
    schedule = compile_schedule(iter(strategy), max_frames, T)

    # abstract init (no device memory needed)
    # PRNG key width depends on the active impl (threefry: 2 words,
    # rbg: 4) — derive it so VDT_PRNG=rbg probes match bench.py's HLO
    key_s = jax.eval_shape(lambda: jax.random.PRNGKey(0))
    e = (1, 1, 1)
    F = max_frames
    x_s = jax.ShapeDtypeStruct((1, F, size, size, 3), jnp.float32)
    m_s = jax.ShapeDtypeStruct((1, F, *e), jnp.float32)
    fi_s = jax.ShapeDtypeStruct((1, F), jnp.int32)
    t_s = jax.ShapeDtypeStruct((1,), jnp.int32)
    variables_shape = jax.eval_shape(
        lambda r, x, t, m, fi: model.init(
            {"params": r}, x, diffusion.scale_timesteps(t), x0=x, obs_mask=m,
            latent_mask=m, kinda_marg_mask=m, frame_indices=fi,
            observed_frames="x_0",
        ),
        key_s, x_s, t_s, m_s, fi_s,
    )

    batch_s = jax.ShapeDtypeStruct((B, T, size, size, 3), jnp.float32)
    rng_s = key_s
    fn = jax.jit(
        lambda v, b, r: sample_video_windows_parallel(
            model, v, diffusion, schedule, b, obs_length, r
        )
    )
    compiled = fn.lower(variables_shape, batch_s, rng_s).compile()
    ma = compiled.memory_analysis()
    gb = 1024**3
    out = {
        "batch": B,
        "respace": respace,
        "argument_GB": round(ma.argument_size_in_bytes / gb, 3),
        "output_GB": round(ma.output_size_in_bytes / gb, 3),
        "temp_GB": round(ma.temp_size_in_bytes / gb, 3),
        "total_GB": round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes) / gb, 3,
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
