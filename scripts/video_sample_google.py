"""Two-model google-style cascade sampling (reference
scripts/video_sample_google.py): a frameskip-4 model fills a coarse grid,
then a frameskip-1 model infills, with the network picked per inference step
by the strategy's ``_active_iterator``. Host drives the strategy; each window
runs as one jitted computation per model (two compiles total)."""

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_test_dataset
from video_diffusion_tpu.sampling.sampler import _denoise_window
from video_diffusion_tpu.sampling.strategies import Google
from video_diffusion_tpu.utils import eval_util
from video_diffusion_tpu.utils.protect import Protect
from video_diffusion_tpu.utils.script_util import str2bool

logger = logging.getLogger(__name__)


def infer_video_google(args, models, diffusions, batch, rng):
    """models/diffusions: dict phase -> (model, variables) / diffusion."""
    B, T = batch.shape[:2]
    samples = np.zeros((B, T) + batch.shape[2:], dtype=np.float32)
    samples[:, : args.obs_length] = batch[:, : args.obs_length]
    strategy = Google(video_length=T, num_obs=args.obs_length)
    window_fns = {}
    for phase, F in (("fs4", 16), ("fs1", 9)):
        model, _ = models[phase]
        diffusion = diffusions[phase]
        window_fns[phase] = jax.jit(
            lambda v, x0, om, lm, fi, r, m=model, d=diffusion:
            _denoise_window(m, v, d, x0, om, lm, fi, r)
        )
    it = iter(strategy)
    while True:
        try:
            obs_idx, lat_idx = next(it)
        except StopIteration:
            break
        phase = strategy._active_iterator
        F = 16 if phase == "fs4" else 9
        window = list(obs_idx) + list(lat_idx)
        x0 = np.zeros((B, F) + batch.shape[2:], dtype=np.float32)
        x0[:, : len(window)] = samples[:, window]
        e = (1, 1, 1)
        om = np.zeros((B, F, *e), dtype=np.float32)
        om[:, : len(obs_idx)] = 1
        lm = np.zeros((B, F, *e), dtype=np.float32)
        lm[:, len(obs_idx) : len(window)] = 1
        fi = np.zeros((B, F), dtype=np.int32)
        fi[:, : len(window)] = window
        rng, wrng = jax.random.split(rng)
        local = np.asarray(
            window_fns[phase](
                models[phase][1],
                jnp.asarray(x0), jnp.asarray(om), jnp.asarray(lm),
                jnp.asarray(fi), wrng,
            )
        )
        samples[:, lat_idx] = local[:, len(obs_idx) : len(window)]
    return samples


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path_fs4", type=str)
    parser.add_argument("checkpoint_path_fs1", type=str)
    parser.add_argument("--eval_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=4)
    parser.add_argument("--obs_length", type=int, default=36)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--subset_size", type=int, default=None)
    parser.add_argument("--indices", type=int, nargs="*", default=None)
    parser.add_argument("--num_samples", type=int, default=1)
    parser.add_argument("--sample_idx", type=int, default=None)
    parser.add_argument("--use_ddim", type=str2bool, default=False)
    parser.add_argument("--timestep_respacing", type=str, default="")
    parser.add_argument("--optimality", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--use_bf16", type=str2bool, default=True)
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    models, diffusions = {}, {}
    for phase, path in (("fs4", args.checkpoint_path_fs4),
                        ("fs1", args.checkpoint_path_fs1)):
        (model, variables, diffusion), model_args, _ = eval_util.load_checkpoint(
            path, use_ddim=args.use_ddim,
            timestep_respacing=args.timestep_respacing, use_bf16=args.use_bf16,
        )
        models[phase] = (model, variables)
        diffusions[phase] = diffusion
    args.checkpoint_path = args.checkpoint_path_fs4
    args.inference_mode = "google"
    args.max_frames = 16
    args.step_size = 8

    dataset = get_test_dataset(
        dataset_name=model_args.dataset, T=args.T,
        image_size=getattr(model_args, "image_size", None),
    )
    if args.T is None:
        args.T = dataset[0][0].shape[0]
    from pathlib import Path

    args.eval_dir = eval_util.get_model_results_path(
        args
    ) / eval_util.get_eval_run_identifier(args)
    args.eval_dir = Path(args.eval_dir)
    (args.eval_dir / "samples").mkdir(parents=True, exist_ok=True)

    indices = args.indices or list(range(args.subset_size or len(dataset)))
    json_path = args.eval_dir / "model_config.json"
    if not json_path.exists():
        with Protect(json_path):
            with open(json_path, "w") as f:
                json.dump(vars(model_args), f, indent=4, default=str)

    cnt = 0
    while cnt < len(indices):
        sel = indices[cnt : cnt + args.batch_size]
        for sample_idx in (
            range(args.num_samples) if args.sample_idx is None else [args.sample_idx]
        ):
            out_files = [
                args.eval_dir / "samples" / f"sample_{v:04d}-{sample_idx}.npy"
                for v in sel
            ]
            todo = [not p.exists() for p in out_files]
            if not any(todo):
                continue
            batch = np.stack([np.asarray(dataset[i][0]) for i in sel])[:, : args.T]
            rng = jax.random.PRNGKey(hash((args.seed, cnt, sample_idx)) % (2**31))
            recon = infer_video_google(args, models, diffusions, batch, rng)
            recon = np.clip((recon + 1) / 2 * 255, 0, 255).astype(np.uint8)
            recon = np.moveaxis(recon, -1, 2)
            for i, p in enumerate(out_files):
                if todo[i]:
                    np.save(p, recon[i])
                    logger.info(f"*** Saved {p} ***")
        cnt += len(sel)


if __name__ == "__main__":
    main()
