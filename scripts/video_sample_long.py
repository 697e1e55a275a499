"""Unbounded-length video generation by chaining fixed-length chunks
(reference scripts/video_sample_long.py): chunk k is generated conditioned on
the last obs_length frames of chunk k-1 and written to video_<k>.npy; the
chain is resumable from the output directory (config consistency-checked),
and chunk 0 can be sampled unconditionally."""

import argparse
import json
import logging
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_test_dataset
from video_diffusion_tpu.sampling import (
    compile_schedule,
    inference_strategies,
    sample_video,
)
from video_diffusion_tpu.utils import eval_util
from video_diffusion_tpu.utils.protect import Protect
from video_diffusion_tpu.utils.script_util import str2bool

logger = logging.getLogger(__name__)


def main(args, model, variables, diffusion):
    out_dir = Path(args.eval_dir) / "long_videos"
    out_dir.mkdir(parents=True, exist_ok=True)

    # config consistency check for resumed chains (reference :228-245)
    chain_cfg_path = out_dir / "chain_config.json"
    chain_cfg = dict(
        T=args.T, obs_length=args.obs_length, max_frames=args.max_frames,
        step_size=args.step_size, inference_mode=args.inference_mode,
    )
    if chain_cfg_path.exists():
        with open(chain_cfg_path) as f:
            stored = json.load(f)
        assert stored == chain_cfg, (
            f"resuming with inconsistent config:\nstored: {stored}\nnew: {chain_cfg}"
        )
    else:
        with Protect(chain_cfg_path):
            with open(chain_cfg_path, "w") as f:
                json.dump(chain_cfg, f, indent=2)

    # compiled schedules: chunk 0 may be unconditional
    def make_schedule(num_obs):
        strategy = inference_strategies[args.inference_mode](
            video_length=args.T, num_obs=num_obs,
            max_frames=args.max_frames, step_size=args.step_size,
        )
        return compile_schedule(iter(strategy), args.max_frames, args.T)

    sched_cond = make_schedule(args.obs_length)
    fn_cond = jax.jit(
        lambda v, b, r: sample_video(
            model, v, diffusion, sched_cond, b, args.obs_length, r
        )
    )
    shape = (args.batch_size, args.T, args.image_size, args.image_size, 3)

    prev_tail = None
    for k in range(args.num_chunks):
        out_path = out_dir / f"video_{k}.npy"
        if out_path.exists():
            arr = np.load(out_path).astype(np.float32) / 255 * 2 - 1
            prev_tail = np.moveaxis(arr, 2, -1)[:, -args.obs_length:]
            logger.info(f"chunk {k} exists, resuming past it")
            continue
        rng = jax.random.PRNGKey(hash((args.seed, k)) % (2**31))
        if k == 0 and prev_tail is None:
            if args.obs_length == 0:
                sched0 = make_schedule(0)
                fn0 = jax.jit(
                    lambda v, b, r: sample_video(
                        model, v, diffusion, sched0, b, 0, r
                    )
                )
                batch = np.zeros(shape, dtype=np.float32)
                out = np.asarray(fn0(variables, batch, rng))
            else:
                dataset = get_test_dataset(
                    dataset_name=args.dataset, T=None, image_size=args.image_size
                )
                gt = np.stack(
                    [np.asarray(dataset[i][0]) for i in range(args.batch_size)]
                )
                batch = np.zeros(shape, dtype=np.float32)
                batch[:, : args.obs_length] = gt[:, : args.obs_length]
                out = np.asarray(fn_cond(variables, batch, rng))
        else:
            batch = np.zeros(shape, dtype=np.float32)
            batch[:, : args.obs_length] = prev_tail
            out = np.asarray(fn_cond(variables, batch, rng))
        prev_tail = out[:, -args.obs_length:] if args.obs_length else out[:, -1:]
        arr = np.clip((out + 1) / 2 * 255, 0, 255).astype(np.uint8)
        arr = np.moveaxis(arr, -1, 2)  # (B, T, C, H, W)
        np.save(out_path, arr)
        logger.info(f"*** Saved {out_path} ***")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("--eval_dir", default=None)
    parser.add_argument("--inference_mode", default="autoreg",
                        choices=inference_strategies.keys())
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_chunks", type=int, default=4)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--obs_length", type=int, default=10)
    parser.add_argument("--step_size", type=int, default=1)
    parser.add_argument("--use_ddim", type=str2bool, default=False)
    parser.add_argument("--timestep_respacing", type=str, default="")
    parser.add_argument("--optimality", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--use_bf16", type=str2bool, default=True)
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO)
    (model, variables, diffusion), model_args, _ = eval_util.load_checkpoint(
        args.checkpoint_path,
        use_ddim=args.use_ddim,
        timestep_respacing=args.timestep_respacing,
        use_bf16=args.use_bf16,
    )
    args.dataset = model_args.dataset
    args.image_size = model_args.image_size
    if args.max_frames is None:
        args.max_frames = model_args.max_frames
    if args.T is None:
        args.T = model_args.T
    args.eval_dir = args.eval_dir or str(
        eval_util.get_model_results_path(args)
        / eval_util.get_eval_run_identifier(args)
    )
    main(args, model, variables, diffusion)
