"""Sample videos in 'horizontal' order — the outer loop runs over diffusion
timesteps, the inner loop over the full frame schedule each timestep, so all
windows stay at the same noise level; --vertical_steps runs a normal
per-window prefix first (reference scripts/video_sample_full.py).

Eval-dir postfix: '_full' (pure horizontal) or '_hybrid_<vertical_steps>'.
"""

import argparse
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# same production PRNG default as scripts/video_sample.py (see note there)
os.environ.setdefault("VDT_PRNG", "rbg")

import jax

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_test_dataset, get_train_dataset
from video_diffusion_tpu.sampling import compile_schedule, inference_strategies
from video_diffusion_tpu.sampling.sampler import sample_video_horizontal
from video_diffusion_tpu.utils import eval_util
from video_diffusion_tpu.utils.protect import Protect
from video_diffusion_tpu.utils.script_util import str2bool

logger = logging.getLogger(__name__)


def main(args, model, variables, diffusion, dataset, dataset_indices):
    strategy = inference_strategies[args.inference_mode](
        video_length=args.T,
        num_obs=args.obs_length,
        max_frames=args.max_frames,
        step_size=args.step_size,
    )
    schedule = compile_schedule(iter(strategy), args.max_frames, args.T)
    fn = jax.jit(
        lambda v, b, r: sample_video_horizontal(
            model, v, diffusion, schedule, b, args.obs_length, r,
            vertical_steps=args.vertical_steps,
            observed_frames=args.observed_frames,
            use_gradient_method=args.use_gradient_method,
            goal_directed="goal-directed" in args.inference_mode,
        )
    )
    idx_list = [i for i in dataset_indices if i < len(dataset)]
    cnt = 0
    while cnt < len(idx_list):
        sel = idx_list[cnt : cnt + args.batch_size]
        for sample_idx in (
            range(args.num_samples) if args.sample_idx is None else [args.sample_idx]
        ):
            out_files = [
                args.eval_dir / "samples" / f"sample_{vid:04d}-{sample_idx}.npy"
                for vid in sel
            ]
            todo = [not p.exists() for p in out_files]
            if not any(todo):
                continue
            batch = np.stack([np.asarray(dataset[i][0]) for i in sel])[:, : args.T]
            rng = jax.random.PRNGKey(hash((args.seed, cnt, sample_idx)) % (2**31))
            recon = np.asarray(fn(variables, batch, rng))
            recon = np.clip((recon + 1) / 2 * 255, 0, 255).astype(np.uint8)
            recon = np.moveaxis(recon, -1, 2)
            for i, p in enumerate(out_files):
                if todo[i]:
                    np.save(p, recon[i])
                    logger.info(f"*** Saved {p} ***")
        cnt += len(sel)


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--eval_dir", default=None)
    parser.add_argument("--dataset_partition", default="test",
                        choices=["train", "test"])
    parser.add_argument("--inference_mode", required=True,
                        choices=inference_strategies.keys())
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--obs_length", type=int, default=36)
    parser.add_argument("--step_size", type=int, default=1)
    parser.add_argument("--vertical_steps", type=int, default=0)
    parser.add_argument("--indices", type=int, nargs="*", default=None)
    parser.add_argument("--use_ddim", type=str2bool, default=False)
    parser.add_argument("--timestep_respacing", type=str, default="")
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--subset_size", type=int, default=None)
    parser.add_argument("--num_samples", type=int, default=1)
    parser.add_argument("--sample_idx", type=int, default=None)
    parser.add_argument("--task_id", type=int, default=None)
    parser.add_argument("--use_gradient_method", action="store_true")
    parser.add_argument("--observed_frames", type=str, default="x_0",
                        choices=["x_0", "x_t", "x_t_minus_1"])
    parser.add_argument("--optimality", type=str, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--use_bf16", type=str2bool, default=True)
    args = parser.parse_args()

    postfix = (
        "_full" if args.vertical_steps == 0 else f"_hybrid_{args.vertical_steps}"
    )
    args.eval_dir = eval_util.get_model_results_path(
        args
    ) / eval_util.get_eval_run_identifier(args, postfix=postfix)
    (args.eval_dir / "samples").mkdir(parents=True, exist_ok=True)
    logging.basicConfig(level=logging.INFO)

    (model, variables, diffusion), model_args, _ = eval_util.load_checkpoint(
        args.checkpoint_path,
        use_ddim=args.use_ddim,
        timestep_respacing=args.timestep_respacing,
        use_bf16=args.use_bf16,
    )
    if args.max_frames is None:
        args.max_frames = model_args.max_frames
    get_ds = get_test_dataset if args.dataset_partition == "test" else get_train_dataset
    dataset = get_ds(
        dataset_name=model_args.dataset, T=args.T,
        image_size=getattr(model_args, "image_size", None),
    )
    if args.T is None:
        args.T = dataset[0][0].shape[0]
    if args.indices is None and args.task_id is not None:
        args.indices = list(
            range(args.task_id * args.batch_size, (args.task_id + 1) * args.batch_size)
        )
    elif args.subset_size is not None:
        args.indices = list(range(args.subset_size))
    elif args.indices is None:
        args.indices = list(range(len(dataset)))

    json_path = args.eval_dir / "model_config.json"
    if not json_path.exists():
        with Protect(json_path):
            with open(json_path, "w") as f:
                json.dump(vars(model_args), f, indent=4, default=str)

    main(args, model, variables, diffusion, dataset, args.indices)
