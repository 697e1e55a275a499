"""Sample long videos from a trained checkpoint with a pluggable inference
strategy.

CLI/output parity with /root/reference/scripts/video_sample.py: same flags,
same eval-dir naming, same idempotent `samples/sample_<vid:04d>-<seed>.npy`
uint8 (T, C, H, W) files, same model_config.json. TPU-native internals: the
whole rollout of a non-adaptive strategy is one jitted lax.scan
(video_diffusion_tpu/sampling/sampler.py) instead of one device round trip
per (inference step x diffusion timestep).
"""

import argparse
import json
import logging
import os
import sys
from argparse import Namespace

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

# Production default matches bench.py: 'rbg' sampler noise is the standard
# TPU PRNG speed knob (same normal distribution, DIFFERENT stream than
# threefry — fixed-seed sample files change vs pre-round-4 runs). Export
# VDT_PRNG=threefry2x32 to reproduce old streams.
os.environ.setdefault("VDT_PRNG", "rbg")

import jax

import video_diffusion_tpu.utils  # noqa: F401  (jax compilation cache)
from video_diffusion_tpu.data import (
    get_test_dataset,
    get_train_dataset,
    get_variable_length_dataset,
)
from video_diffusion_tpu.sampling import (
    compile_schedule,
    inference_strategies,
    sample_video,
)
from video_diffusion_tpu.sampling.sampler import (
    PARALLEL_WINDOW_STRATEGIES,
    sample_video_adaptive,
    sample_video_windows_parallel,
    sample_video_with_trajectory,
)
from video_diffusion_tpu.utils import eval_util
from video_diffusion_tpu.utils.protect import Protect
from video_diffusion_tpu.utils.script_util import str2bool

logger = logging.getLogger(__name__)


def make_strategy(args, optimal_schedule_path=None):
    adaptive_kwargs = dict(distance="lpips") if "adaptive" in args.inference_mode else {}
    return inference_strategies[args.inference_mode](
        video_length=args.T,
        num_obs=args.obs_length,
        max_frames=args.max_frames,
        step_size=args.step_size,
        optimal_schedule_path=optimal_schedule_path,
        **adaptive_kwargs,
    )


def infer_video(args, model, variables, diffusion, batch, rng,
                optimal_schedule_path=None):
    """batch: (B, T, H, W, C) in [-1, 1]. Returns (B, T, H, W, C) samples."""
    strategy = make_strategy(args, optimal_schedule_path)
    if "adaptive" in args.inference_mode:
        return sample_video_adaptive(
            model, variables, diffusion, strategy, batch, args.obs_length, rng,
            observed_frames=args.observed_frames,
            use_gradient_method=args.use_gradient_method,
        )
    schedule = compile_schedule(iter(strategy), args.max_frames, args.T)
    if args.save_all_timesteps:
        return sample_video_with_trajectory(
            model, variables, diffusion, schedule, batch, args.obs_length, rng,
            observed_frames=args.observed_frames,
            use_gradient_method=args.use_gradient_method,
            goal_directed="goal-directed" in args.inference_mode,
        )
    # Remote-execution deadline escapes (BENCH.md "Batch > 10"):
    # VDT_T_CHUNK=N splits every reverse scan into N-step device calls
    # (bit-identical output, parity-tested); VDT_ROLLOUT_NO_JIT=1
    # additionally keeps the rollout host loop eager. On real TPU pods
    # neither is needed and the single fused program is fastest.
    t_chunk = int(os.environ.get("VDT_T_CHUNK", "0")) or None
    wrap = (
        (lambda f: f)
        if t_chunk or os.environ.get("VDT_ROLLOUT_NO_JIT", "") == "1"
        else jax.jit
    )
    if (
        args.inference_mode in PARALLEL_WINDOW_STRATEGIES
        and not args.no_parallel_windows
    ):
        # windows never condition on generated frames -> denoise all windows
        # in one batched reverse process (TPU-first; distributionally
        # identical to the sequential order)
        fn = wrap(
            lambda v, b, r: sample_video_windows_parallel(
                model, v, diffusion, schedule, b, args.obs_length, r,
                observed_frames=args.observed_frames,
                use_gradient_method=args.use_gradient_method,
                t_chunk=t_chunk,
            )
        )
    else:
        fn = wrap(
            lambda v, b, r: sample_video(
                model, v, diffusion, schedule, b, args.obs_length, r,
                observed_frames=args.observed_frames,
                use_gradient_method=args.use_gradient_method,
                goal_directed="goal-directed" in args.inference_mode,
                t_chunk=t_chunk,
            )
        )
    # params pass through the jit boundary as args (remote-compile size limit)
    return np.asarray(fn(variables, batch, rng))


def main(args, model, variables, diffusion, dataset, dataset_indices):
    optimal_schedule_path = (
        None if args.optimality is None else args.eval_dir / "optimal_schedule.pt"
    )

    idx_list = (
        list(dataset_indices) if dataset_indices is not None else list(range(len(dataset)))
    )
    idx_list = [i for i in idx_list if i < len(dataset)]
    cnt = 0
    while cnt < len(idx_list):
        sel = idx_list[cnt : cnt + args.batch_size]
        batch = np.stack([np.asarray(dataset[i][0]) for i in sel])
        batch_size = len(batch)
        for sample_idx in (
            range(args.num_samples) if args.sample_idx is None else [args.sample_idx]
        ):
            out_files = [
                args.eval_dir / "samples" / f"sample_{vid:04d}-{sample_idx}.npy"
                for vid in sel
            ]
            todo = [not p.exists() for p in out_files]
            if not any(todo):
                logger.info(
                    f"Nothing to do for batches {cnt} - {cnt + batch_size - 1}, "
                    f"sample #{sample_idx}."
                )
                continue
            if args.T is not None:
                batch = batch[:, : args.T]
            rng = jax.random.PRNGKey(
                hash((args.seed, cnt, sample_idx)) % (2**31)
            )
            out = infer_video(
                args, model, variables, diffusion, batch, rng,
                optimal_schedule_path=optimal_schedule_path,
            )
            recon, all_ts = out if args.save_all_timesteps else (out, None)
            # to uint8 (T, C, H, W) for byte-layout parity with the reference
            recon_u8 = np.clip((recon + 1) / 2 * 255, 0, 255).astype(np.uint8)
            recon_u8 = np.moveaxis(recon_u8, -1, 2)  # (B, T, C, H, W)
            for i in range(batch_size):
                if todo[i]:
                    np.save(out_files[i], recon_u8[i])
                    logger.info(f"*** Saved {out_files[i]} ***")
                else:
                    logger.info(f"Skipped {out_files[i]}")
            if args.save_all_timesteps:
                # q_sample the gt at every timestep + per-timestep errors
                # (reference video_sample.py:243-306)
                import jax as _jax
                import jax.numpy as jnp

                K = diffusion.num_timesteps
                qrng = _jax.random.PRNGKey(hash((args.seed, cnt, 1)) % (2**31))
                q_all = []
                for ts in range(K):
                    qrng, r = _jax.random.split(qrng)
                    noise = _jax.random.normal(r, batch.shape)
                    tvec = jnp.full((batch_size,), ts, dtype=jnp.int32)
                    q_all.append(np.asarray(
                        diffusion.q_sample(jnp.asarray(batch), tvec, noise)
                    ))
                q_all = np.stack(q_all, axis=1)  # (B, K, T, H, W, C)
                error = q_all - all_ts
                all_u8 = np.clip((all_ts + 1) / 2 * 255, 0, 255).astype(np.uint8)
                for i, vid in enumerate(sel):
                    if not todo[i]:
                        continue
                    base = args.eval_dir / "samples"
                    np.save(base / f"q_sample_{vid:04d}-{sample_idx}.npy",
                            np.moveaxis(q_all[i], -1, 2))
                    np.save(base / f"error_{vid:04d}-{sample_idx}.npy",
                            np.moveaxis(error[i], -1, 2))
                    np.save(base / f"all_timestep_sample_{vid:04d}-{sample_idx}.npy",
                            np.moveaxis(all_u8[i], -1, 2))
                    logger.info(f"*** Saved all-timestep arrays for {vid} ***")
        cnt += batch_size


def visualise(args):
    """Render the inference schedule itself as a PNG
    (reference video_sample.py:311-401)."""
    from PIL import Image

    optimal_schedule_path = (
        None
        if getattr(args, "optimality", None) is None
        else args.eval_dir / "optimal_schedule.pt"
    )
    strategy = make_strategy(args, optimal_schedule_path)
    if "adaptive" in args.inference_mode:
        raise NotImplementedError("adaptive visualisation requires dataset content")
    indices = list(strategy)
    vis = []
    exist = list(range(args.obs_length))
    for obs_idx, lat_idx in indices:
        exist.extend(lat_idx)
        layer = np.zeros((args.T, 3), dtype=np.int32)
        layer[exist, 0] = 50
        layer[obs_idx, 0] = 255
        layer[lat_idx, 2] = 255
        vis.append(layer)
        vis.append(layer * 0)
    vis = np.stack([vis[-1], *vis])
    os.makedirs("visualisations", exist_ok=True)
    path = f"visualisations/sample_vis_{args.inference_mode}"
    if args.obs_length == 0:
        path += "_uncond"
    if getattr(args, "optimality", None) is not None:
        path += "_optimal-" + args.optimality
    path += f"_T={args.T}_sampling_{args.step_size}_out_of_{args.max_frames}.png"
    Image.fromarray(vis.astype(np.uint8)).save(path)
    print(f"Saved to {path}")


def create_argparser():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--eval_dir", default=None)
    parser.add_argument(
        "--dataset_partition", default="test",
        choices=["train", "test", "variable_length"],
    )
    parser.add_argument("--override_dataset", default=None, type=str)
    parser.add_argument("--device", default=None)  # accepted for parity; unused
    parser.add_argument("--use_gradient_method", action="store_true")
    parser.add_argument(
        "--inference_mode", required=True, choices=inference_strategies.keys()
    )
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--obs_length", type=int, default=36)
    parser.add_argument("--step_size", type=int, default=1)
    parser.add_argument("--indices", type=int, nargs="*", default=None)
    parser.add_argument("--use_ddim", type=str2bool, default=False)
    parser.add_argument("--timestep_respacing", type=str, default="")
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--subset_size", type=int, default=None)
    parser.add_argument("--num_samples", type=int, default=1)
    parser.add_argument("--sample_idx", type=int, default=None)
    parser.add_argument("--task_id", type=int, default=None)
    parser.add_argument("--just_visualise", action="store_true")
    parser.add_argument("--big_visualise", action="store_true")
    parser.add_argument(
        "--optimality", type=str, default=None,
        choices=[
            "linspace-t", "random-t",
            "linspace-t-force-nearby", "random-t-force-nearby",
        ],
    )
    parser.add_argument(
        "--observed_frames", type=str, default="x_0", choices=["x_0"]
    )
    parser.add_argument("--save_all_timesteps", action="store_true")
    parser.add_argument(
        "--no_parallel_windows", action="store_true",
        help="force the sequential window order even for independent modes",
    )
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--use_bf16", type=str2bool, default=True)
    return parser


if __name__ == "__main__":
    args = create_argparser().parse_args()
    args.eval_dir = eval_util.get_model_results_path(
        args
    ) / eval_util.get_eval_run_identifier(args)
    args.eval_dir.mkdir(parents=True, exist_ok=True)
    logging.basicConfig(
        filename=args.eval_dir / "video_sample.log",
        filemode="w",
        format="%(name)s - %(levelname)s - %(message)s",
        level=logging.INFO,
    )
    logger.addHandler(logging.StreamHandler())

    if args.just_visualise and args.optimality is None:
        if args.T is None or args.max_frames is None:
            raise SystemExit("--just_visualise needs --T and --max_frames")
        visualise(args)
        sys.exit(0)

    (model, variables, diffusion), model_args, step = eval_util.load_checkpoint(
        args.checkpoint_path,
        use_ddim=args.use_ddim,
        timestep_respacing=args.timestep_respacing,
        use_bf16=args.use_bf16,
    )
    if args.override_dataset is not None:
        model_args.dataset = args.override_dataset
    if args.max_frames is None:
        args.max_frames = model_args.max_frames
    logger.info(f"max_frames = {args.max_frames}")

    get_ds = {
        "test": get_test_dataset,
        "train": get_train_dataset,
        "variable_length": lambda dataset_name, T, **_: get_variable_length_dataset(
            dataset_name, T
        ),
    }[args.dataset_partition]
    dataset = get_ds(
        dataset_name=model_args.dataset,
        T=args.T,
        image_size=getattr(model_args, "image_size", None),
    )
    logger.info(f"Dataset size = {len(dataset)}")

    if args.indices is None and args.task_id is not None:
        assert args.subset_size is None
        args.indices = list(
            range(args.task_id * args.batch_size, (args.task_id + 1) * args.batch_size)
        )
        logger.info(f"Only generating predictions for batch #{args.task_id}.")
    elif args.subset_size is not None:
        args.indices = list(range(args.subset_size))
        logger.info(f"Only generating predictions for the first {args.subset_size}.")
    elif args.indices is None:
        args.indices = list(range(len(dataset)))
        logger.info("Generating predictions for the whole dataset.")

    if args.dataset_partition == "variable_length":
        args.eval_dir = args.eval_dir / "variable_length"
    (args.eval_dir / "samples").mkdir(parents=True, exist_ok=True)
    logger.info(f"Saving samples to {args.eval_dir / 'samples'}")

    if args.T is None:
        args.T = dataset[0][0].shape[0]
        logger.info(f"Using dataset video length as T ({args.T}).")

    json_path = args.eval_dir / "model_config.json"
    if not json_path.exists():
        with Protect(json_path):
            with open(json_path, "w") as f:
                json.dump(vars(model_args), f, indent=4, default=str)
        logger.info(f"Saved model config at {json_path}")

    main(args, model, variables, diffusion, dataset, args.indices)
