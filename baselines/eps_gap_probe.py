"""Conditioning-emergence probe: one-step x0-MSE gap with vs without obs.

The decisive signal for whether a video model has learned to USE its
observed frames (the round-5 diagnosis direction, made cadence-cheap and
recalibrated this round): predict x0 from x_t on real test windows twice —
once with the true observations conditioning the model (training-consistent
x_t_minus_1 variants, reference gaussian_diffusion.py:814-828), once with
obs_mask zeroed (frames blanked, neither obs nor latent) — and compare
latent-frame x0-MSE. Identical noise in both arms, so the difference is
purely the model's response to its observations.

Calibration on this repo's checkpoints (batch 16-32, CPU):
  bb-long 200k (32x32, KNOWN conditioned — 15% window-probe SSIM gap):
      gap_pct = +1.1 / +3.6 / +3.1 at t = 300 / 500 / 700
  bb64 25k (64x64, KNOWN unconditioned — window probes at the floor):
      gap_pct = +0.35 / +0.28 at t = 500 / 700
A sustained gap >= ~2% at t in {500, 700} == conditioning has emerged.
The single-forward gap is intrinsically small even on a conditioned model
(the obs variants carry the same noise level as the latents at high t; the
round-1 analysis — eps-space conditioning signal scales as sqrt(alpha_bar)
— bounds it), so this probe is a TREND instrument, not an absolute one:
watch it rise from ~0.3 toward the control band across checkpoints.

Runs on CPU (JAX_PLATFORMS=cpu, ~3 min at 64x64 B=16) while the trainer
owns the TPU; wired into scripts/archive_latest_checkpoints.sh via
PROBE_DATA so every archived EMA appends a line to eps_gap.jsonl.

Usage:
  python baselines/eps_gap_probe.py <ema-ckpt> \
      --data datasets/bouncing_balls_64/test.pt --T 20 --n_obs 5 --t 500 700
"""

import argparse
import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="EMA (or model) checkpoint .pt")
    parser.add_argument("--data", default="datasets/bouncing_balls_64/test.pt")
    parser.add_argument("--T", type=int, default=20, help="window length")
    parser.add_argument("--n_obs", type=int, default=5)
    parser.add_argument("--batch", type=int, default=8)
    parser.add_argument("--t", type=int, nargs="+", default=[700])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--observed_frames", default="x_t_minus_1",
        help="conditioning variant fed to the model. Must match training "
        "(x_t_minus_1): feeding clean x_0 to an x_t_minus_1-trained model is "
        "out-of-distribution at high t and INVERTS the gap on the "
        "conditioned bb-long 200k control (-5.6%% vs +3.7%%).")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    import video_diffusion_tpu.utils  # noqa: F401
    from video_diffusion_tpu.models import factory as _f
    from video_diffusion_tpu.models.wrappers import make_video_model_fn
    from video_diffusion_tpu.utils import checkpoint as ckpt_lib

    data = ckpt_lib.load_checkpoint(args.checkpoint)
    config = dict(_f.video_model_and_diffusion_defaults())
    config.update({k: v for k, v in data["config"].items() if k in config})
    import inspect

    sig = inspect.signature(_f.create_video_model_and_diffusion)
    kwargs = {k: config[k] for k in sig.parameters if k in config}
    model, diffusion = _f.create_video_model_and_diffusion(
        **kwargs, use_bf16=data["config"].get("use_bf16", True)
    )
    params = jax.tree_util.tree_map(jnp.asarray, data["state_dict"])
    observed_frames = args.observed_frames

    vids = torch.load(args.data)[: args.batch, : args.T].numpy()  # (B,T,1,H,W)
    vids = np.repeat(vids, 3, axis=2)  # grayscale -> RGB
    x0 = jnp.asarray(np.transpose(vids, (0, 1, 3, 4, 2)) * 2 - 1)  # BTHWC
    B, T = x0.shape[:2]

    obs = jnp.zeros((B, T, 1, 1, 1)).at[:, : args.n_obs].set(1.0)
    latent = 1.0 - obs
    marg = jnp.zeros_like(obs)
    fi = jnp.broadcast_to(jnp.arange(T)[None], (B, T))

    def eval_mse(p, x0, t_vec, rng, with_obs):
        """Latent-masked x0-space prediction error at fixed t.

        For a fixed x_t the x0 error is a per-t linear map of the eps error,
        so the gap RATIO is identical either way; x0-space is reported
        because its magnitudes are interpretable against the data range
        ([-1,1] pixels) across t values.
        """
        model_fn = make_video_model_fn(
            model, {"params": p}, diffusion,
            x0=x0, obs_mask=obs if with_obs else jnp.zeros_like(obs),
            latent_mask=latent, kinda_marg_mask=marg, frame_indices=fi,
            observed_frames=observed_frames,
        )
        nrng, crng = jax.random.split(rng)
        noise = jax.random.normal(nrng, x0.shape, dtype=x0.dtype)
        x_t = diffusion.q_sample(x0, t_vec, noise=noise)
        cond = diffusion.make_conditioning_variants(
            x0, t_vec, noise, crng, observed_frames)
        out = model_fn(x_t, t_vec, cond=cond)
        eps = diffusion.split_model_output(out, x_t)[0] \
            if out.shape[-1] != x_t.shape[-1] else out
        pred_x0 = diffusion._predict_xstart_from_eps(x_t, t_vec, eps)
        se = (pred_x0 - x0) ** 2 * latent
        return se.sum() / (latent.sum() * np.prod(x0.shape[2:]))

    jit_eval = jax.jit(eval_mse, static_argnames=("with_obs",))
    step = data.get("step", 0)
    if not step:
        m = re.search(r"_(\d+)\.pt$", args.checkpoint)
        step = int(m.group(1)) if m else 0
    rng = jax.random.PRNGKey(args.seed)
    for t in args.t:
        t_vec = jnp.full((B,), t, dtype=jnp.int32)
        # identical noise/rng for both arms: the only difference is the mask
        mse_with = float(jit_eval(params, x0, t_vec, rng, True))
        mse_without = float(jit_eval(params, x0, t_vec, rng, False))
        gap = 100.0 * (mse_without - mse_with) / max(mse_without, 1e-12)
        print(json.dumps({
            "probe": "eps_gap", "ckpt": os.path.basename(args.checkpoint),
            "step": int(step), "t": int(t),
            "mse_with": round(mse_with, 6), "mse_without": round(mse_without, 6),
            "gap_pct": round(gap, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
