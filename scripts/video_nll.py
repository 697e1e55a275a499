"""Masked ELBO/NLL evaluation of a video model (reference scripts/video_nll.py):
for each test video, build obs/latent frame sets (from an inference strategy
or a saved indices file), pack the window, and run the subsampled VLB.
Saves per-video elbos/elbo_<i>.pkl; used by the optimal-schedule search."""

import argparse
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_test_dataset
from video_diffusion_tpu.models.wrappers import make_video_model_fn
from video_diffusion_tpu.sampling import inference_strategies
from video_diffusion_tpu.utils import eval_util
from video_diffusion_tpu.utils.script_util import str2bool


def build_index_sets(args):
    """(obs_indices, latent_indices) per evaluation window."""
    if args.indices_path:
        with open(args.indices_path, "rb") as f:
            obs_list, lat_list = pickle.load(f)
        return list(zip(obs_list, lat_list))
    strategy = inference_strategies[args.inference_mode](
        video_length=args.T,
        num_obs=args.obs_length,
        max_frames=args.max_frames,
        step_size=args.step_size,
    )
    return list(strategy)


def run_bpd_evaluation(
    model, variables, diffusion, batch, obs_indices, latent_indices, rng,
    t_seq=None, max_frames=None,
):
    """Pack (obs, latent) frames into a window and compute the masked VLB
    (reference video_nll.py:142-188). batch: (B, T, H, W, C) in [-1, 1]."""
    obs_indices = [int(i) for i in obs_indices]
    latent_indices = [int(i) for i in latent_indices]
    window = obs_indices + latent_indices
    B = batch.shape[0]
    F = max_frames or len(window)
    x0 = np.zeros((B, F) + batch.shape[2:], dtype=np.float32)
    x0[:, : len(window)] = batch[:, window]
    e = (1, 1, 1)
    obs_mask = np.zeros((B, F, *e), dtype=np.float32)
    obs_mask[:, : len(obs_indices)] = 1.0
    latent_mask = np.zeros((B, F, *e), dtype=np.float32)
    latent_mask[:, len(obs_indices) : len(window)] = 1.0
    fidx = np.zeros((B, F), dtype=np.int32)
    fidx[:, : len(window)] = window

    def bpd_fn(v, x0, om, lm, fi, r):
        model_fn = make_video_model_fn(
            model, v, diffusion,
            x0=x0, obs_mask=om, latent_mask=lm,
            kinda_marg_mask=jnp.zeros_like(om),
            frame_indices=fi, observed_frames="x_0",
        )
        return diffusion.calc_bpd_loop_subsampled(
            model_fn, x0, r, latent_mask=lm, t_seq=t_seq
        )

    out = jax.jit(bpd_fn)(
        variables, jnp.asarray(x0), jnp.asarray(obs_mask),
        jnp.asarray(latent_mask), jnp.asarray(fidx), rng,
    )
    return {k: np.asarray(v) for k, v in out.items()}


def main(args):
    (model, variables, diffusion), model_args, _ = eval_util.load_checkpoint(
        args.checkpoint_path, timestep_respacing=args.timestep_respacing
    )
    if args.max_frames is None:
        args.max_frames = model_args.max_frames
    dataset = get_test_dataset(
        dataset_name=model_args.dataset, T=args.T,
        image_size=getattr(model_args, "image_size", None),
    )
    if args.T is None:
        args.T = dataset[0][0].shape[0]
    # same eval-dir convention as video_sample.py: <base>/<run identifier>
    args.eval_dir = str(
        eval_util.get_model_results_path(args)
        / eval_util.get_eval_run_identifier(args)
    )
    out_dir = Path(args.eval_dir) / "elbos"
    out_dir.mkdir(parents=True, exist_ok=True)

    index_sets = build_index_sets(args)
    indices = args.indices or list(range(min(len(dataset), args.num_videos)))
    for vid in indices:
        out_path = out_dir / f"elbo_{vid}.pkl"
        if out_path.exists():
            print(f"skip {out_path}")
            continue
        gt, _ = dataset[vid]
        batch = np.asarray(gt)[None, : args.T]
        results = []
        rng = jax.random.PRNGKey(args.seed + vid)
        for obs_idx, lat_idx in index_sets:
            rng, r = jax.random.split(rng)
            t_seq = (
                None
                if args.num_timesteps is None
                else np.linspace(
                    0, diffusion.num_timesteps - 1, args.num_timesteps
                ).astype(int)[::-1]
            )
            out = run_bpd_evaluation(
                model, variables, diffusion, batch, obs_idx, lat_idx, r,
                t_seq=t_seq, max_frames=args.max_frames,
            )
            results.append(
                {"obs": list(obs_idx), "latent": list(lat_idx), **out}
            )
        with open(out_path, "wb") as f:
            pickle.dump(results, f)
        total = np.mean([r["total_bpd"].mean() for r in results])
        print(f"video {vid}: mean total_bpd={total:.4f} -> {out_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("--eval_dir", type=str, default=None)
    parser.add_argument("--inference_mode", default="autoreg",
                        choices=inference_strategies.keys())
    parser.add_argument("--indices_path", type=str, default=None,
                        help="pickle of (obs_indices_list, latent_indices_list)")
    parser.add_argument("--obs_length", type=int, default=36)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--step_size", type=int, default=1)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--num_videos", type=int, default=10)
    parser.add_argument("--indices", type=int, nargs="*", default=None)
    parser.add_argument("--num_timesteps", type=int, default=None,
                        help="subsample this many VLB timesteps (None = all)")
    parser.add_argument("--timestep_respacing", type=str, default="")
    parser.add_argument("--use_ddim", type=str2bool, default=False)
    parser.add_argument("--optimality", type=str, default=None)
    parser.add_argument("--use_gradient_method", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    main(args)
