"""Conditioning-strength probe: full-chain copy-MAE on a static video.

Round-1 analysis (NOTES_ROUND1.md): conditioning is learned teacher-forced
after ~2.5k steps, but short-trained eps-models lose the observation signal
at high noise (signal ~ sqrt(alpha_bar_t)), so the full sampling chain
commits to wrong content early. This probe makes that measurable: for a
checkpoint, build a STATIC video (all frames identical — copying the
observed frames is the optimal policy), sample latents conditioned on the
first frames, and report mean |sample - observed| over latent frames
("copy-MAE", 0 = perfect conditioning, ~0.4 = unconditional for bouncy
balls).

Usage: python baselines/conditioning_probe.py <ckpt> [--T 20 ...]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint")
    parser.add_argument("--T", type=int, default=10, help="window size")
    parser.add_argument("--n_obs", type=int, default=3)
    parser.add_argument("--batch", type=int, default=4)
    parser.add_argument("--timestep_respacing", default="")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--use_ema", type=lambda s: s.lower() != "false",
                        default=True)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    import video_diffusion_tpu.utils  # noqa: F401
    from video_diffusion_tpu.models.factory import (
        create_video_model_and_diffusion,
        video_model_and_diffusion_defaults,
    )
    from video_diffusion_tpu.models.wrappers import make_video_model_fn
    from video_diffusion_tpu.utils import checkpoint as ckpt_lib

    data = ckpt_lib.load_checkpoint(args.checkpoint)
    config = dict(video_model_and_diffusion_defaults())
    config.update({k: v for k, v in data["config"].items() if k in config})
    if args.timestep_respacing:
        config["timestep_respacing"] = args.timestep_respacing
    import inspect

    from video_diffusion_tpu.models import factory as _f

    sig = inspect.signature(_f.create_video_model_and_diffusion)
    kwargs = {k: config[k] for k in sig.parameters if k in config}
    model, diffusion = create_video_model_and_diffusion(
        **kwargs, use_bf16=data["config"].get("use_bf16", True)
    )
    params = data["state_dict"]
    if args.use_ema:
        ema_path = ckpt_lib.find_ema_checkpoint(
            args.checkpoint, data.get("step", 0),
            str(data["config"].get("ema_rate", "0.9999")).split(",")[0],
            save_latest_only="latest" in os.path.basename(args.checkpoint),
        )
        if ema_path:
            params = ckpt_lib.load_checkpoint(ema_path)["state_dict"]
            print(f"using EMA params: {ema_path}")
    params = jax.tree_util.tree_map(jnp.asarray, params)

    # static videos from the real test set's first frames
    ds_path = "datasets/bouncing_balls_100/test.pt"
    frames = torch.load(ds_path)[: args.batch, 0].numpy()  # (B, 1, 32, 32)
    frames = np.repeat(frames, 3, axis=1)  # grayscale -> RGB
    frame = np.transpose(frames, (0, 2, 3, 1)) * 2 - 1  # (B, H, W, C) [-1,1]
    B, H, W, C = frame.shape
    T = args.T
    x0 = jnp.asarray(np.repeat(frame[:, None], T, axis=1))  # (B, T, H, W, C)

    e = (1, 1, 1)
    obs = jnp.zeros((B, T, *e)).at[:, : args.n_obs].set(1.0)
    latent = 1.0 - obs
    marg = jnp.zeros_like(obs)
    fi = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    def sample_fn(p, x0, r):
        model_fn = make_video_model_fn(
            model, {"params": p}, diffusion, x0=x0, obs_mask=obs,
            latent_mask=latent, kinda_marg_mask=marg, frame_indices=fi,
            observed_frames=data["config"].get("observed_frames", "x_t_minus_1"),
        )
        return diffusion.p_sample_loop(model_fn, x0.shape, r)

    out = jax.jit(sample_fn)(params, x0, jax.random.PRNGKey(args.seed))
    out = np.asarray(out)
    mae = float(
        (np.abs(out - np.asarray(x0)) * np.asarray(latent)).sum()
        / (np.asarray(latent).sum() * H * W * C)
    )
    print(
        f"copy-MAE over latent frames: {mae:.4f}  "
        f"(0=perfect conditioning; ~0.4=unconditional; round-1 10k-step "
        f"model: ~0.37)"
    )


if __name__ == "__main__":
    main()
