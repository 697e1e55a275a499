"""Measure the PyTorch reference's sampling throughput on this host for the
bench.py configuration, writing baselines/reference_bench.json (the
``vs_baseline`` denominator).

Methodology: the reference's video_sample.infer_video drives one synchronous
``p_sample`` per (window x timestep) (reference scripts/video_sample.py:150).
We time that exact call — the reference CondMargVideoModel forward + posterior
step — on a window of the bench shape, average over a few calls, and
extrapolate: frames/sec = B * (T - obs) / (num_windows * respaced_steps *
per_call_seconds). Hardware is recorded in the output; on this machine the
reference can only run on CPU (torch has no TPU backend), which is the
reference's floor, not its GPU speed — interpret vs_baseline accordingly.
"""

import json
import os
import sys
import time
from argparse import Namespace

sys.path.insert(0, "/root/reference")

import numpy as np
import torch


def main():
    torch.set_num_threads(os.cpu_count() or 1)
    from improved_diffusion.script_util import (
        create_video_model_and_diffusion,
        video_model_and_diffusion_defaults,
    )

    T, size, max_frames, step_size, obs_length = 30, 64, 20, 7, 2
    B = int(os.environ.get("BENCH_BATCH", "8"))
    respace = os.environ.get("BENCH_RESPACE", "ddim250")

    defaults = video_model_and_diffusion_defaults()
    defaults.update(
        T=T, image_size=size, num_channels=128, num_res_blocks=2, num_heads=4,
        attention_resolutions="16,8", rp_alpha=T, rp_beta=T, rp_gamma=T,
        diffusion_steps=1000, timestep_respacing=respace,
    )
    args = Namespace(**defaults)
    from improved_diffusion.script_util import args_to_dict

    model, diffusion = create_video_model_and_diffusion(
        **args_to_dict(args, video_model_and_diffusion_defaults().keys())
    )
    model.eval()

    # one 'independent' window: 2 obs + 7 latent = 9 frames
    F = obs_length + step_size
    x0 = torch.rand(B, F, 3, size, size) * 2 - 1
    obs_mask = torch.zeros(B, F, 1, 1, 1)
    obs_mask[:, :obs_length] = 1
    latent_mask = 1 - obs_mask
    kinda = torch.zeros_like(obs_mask)
    frame_indices = torch.arange(F).unsqueeze(0).repeat(B, 1)
    model_kwargs = dict(
        frame_indices=frame_indices, x0=x0, obs_mask=obs_mask,
        latent_mask=latent_mask, kinda_marg_mask=kinda,
        x_t_minus_1=x0, observed_frames="x_0",
    )

    n_calls = int(os.environ.get("REF_CALLS", "3"))
    x = x0.clone()
    times = []
    with torch.no_grad():
        for i in range(n_calls + 1):
            t = torch.tensor([diffusion.num_timesteps - 1 - i] * B)
            t0 = time.perf_counter()
            out = diffusion.p_sample(
                model, x, t, clip_denoised=True, model_kwargs=model_kwargs
            )
            x = out["sample"]
            dt = time.perf_counter() - t0
            if i > 0:  # skip first (allocator warmup)
                times.append(dt)
            print(f"call {i}: {dt:.2f}s")
    per_call = float(np.mean(times))
    num_windows = (T - obs_length) // step_size
    total_calls = num_windows * diffusion.num_timesteps
    frames_per_sec = B * (T - obs_length) / (total_calls * per_call)
    result = {
        "frames_per_sec": frames_per_sec,
        "per_call_seconds": per_call,
        "hardware": f"cpu x{os.cpu_count()} (torch {torch.__version__})",
        "config": {
            "B": B, "T": T, "size": size, "max_frames": max_frames,
            "step_size": step_size, "obs_length": obs_length,
            "respace": respace, "num_channels": 128, "num_res_blocks": 2,
        },
        "methodology": __doc__.strip(),
    }
    out_path = os.path.join(os.path.dirname(__file__), "reference_bench.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: v for k, v in result.items() if k != "methodology"}))


if __name__ == "__main__":
    main()
