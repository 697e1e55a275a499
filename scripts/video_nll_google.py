"""Masked ELBO/NLL for the two-model google cascade
(reference scripts/video_nll_google.py): like video_nll.py but each window is
scored by the cascade phase's own model (fs4 grid windows by the frameskip-4
model, infill windows by the frameskip-1 model)."""

import argparse
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_test_dataset
from video_diffusion_tpu.sampling.strategies import Google
from video_diffusion_tpu.utils import eval_util
from video_diffusion_tpu.utils.script_util import str2bool

from video_nll import run_bpd_evaluation  # noqa: E402


def main(args):
    models, diffusions = {}, {}
    for phase, path in (("fs4", args.checkpoint_path_fs4),
                        ("fs1", args.checkpoint_path_fs1)):
        (model, variables, diffusion), model_args, _ = eval_util.load_checkpoint(
            path, timestep_respacing=args.timestep_respacing
        )
        models[phase] = (model, variables)
        diffusions[phase] = diffusion

    dataset = get_test_dataset(
        dataset_name=model_args.dataset, T=args.T,
        image_size=getattr(model_args, "image_size", None),
    )
    if args.T is None:
        args.T = dataset[0][0].shape[0]
    out_dir = Path(args.eval_dir) / "elbos"
    out_dir.mkdir(parents=True, exist_ok=True)

    # replay the cascade to record (phase, obs, latent) per step
    strategy = Google(video_length=args.T, num_obs=args.obs_length)
    steps = []
    it = iter(strategy)
    while True:
        try:
            obs_idx, lat_idx = next(it)
        except StopIteration:
            break
        steps.append((strategy._active_iterator, obs_idx, lat_idx))

    indices = args.indices or list(range(min(len(dataset), args.num_videos)))
    for vid in indices:
        out_path = out_dir / f"elbo_{vid}.pkl"
        if out_path.exists():
            print(f"skip {out_path}")
            continue
        gt, _ = dataset[vid]
        batch = np.asarray(gt)[None, : args.T]
        rng = jax.random.PRNGKey(args.seed + vid)
        results = []
        for phase, obs_idx, lat_idx in steps:
            model, variables = models[phase]
            rng, r = jax.random.split(rng)
            t_seq = (
                None if args.num_timesteps is None
                else np.linspace(
                    0, diffusions[phase].num_timesteps - 1, args.num_timesteps
                ).astype(int)[::-1]
            )
            out = run_bpd_evaluation(
                model, variables, diffusions[phase], batch, obs_idx, lat_idx,
                r, t_seq=t_seq, max_frames=16 if phase == "fs4" else 9,
            )
            results.append(
                {"phase": phase, "obs": list(obs_idx), "latent": list(lat_idx), **out}
            )
        with open(out_path, "wb") as f:
            pickle.dump(results, f)
        total = np.mean([r["total_bpd"].mean() for r in results])
        print(f"video {vid}: mean total_bpd={total:.4f} -> {out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path_fs4", type=str)
    parser.add_argument("checkpoint_path_fs1", type=str)
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--obs_length", type=int, default=36)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--num_videos", type=int, default=10)
    parser.add_argument("--indices", type=int, nargs="*", default=None)
    parser.add_argument("--num_timesteps", type=int, default=None)
    parser.add_argument("--timestep_respacing", type=str, default="")
    parser.add_argument("--use_ddim", type=str2bool, default=False)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    os.makedirs(args.eval_dir, exist_ok=True)
    main(args)
