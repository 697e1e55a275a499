"""Greedy search for optimal observed-frame sets per inference step
(reference scripts/video_optimal_schedule.py): for each step of a strategy's
schedule, greedily add the done-frame whose observation minimizes the masked
MSE (estimated over a linspace or random set of diffusion t on a training
subset), until the window is full. Resumable partial schedules on disk under
FileLock; output optimal_schedule.pt is consumed by the samplers
(sampling/strategies.py optimal_schedule override).

TPU-native speedup vs the reference: all candidate evaluations for one greedy
iteration are stacked into ONE batched vmap'd VLB computation (candidate axis
padded to a power-of-two bucket, so compiles are O(log max_candidates) for
the whole search, not one per candidate per iteration).
"""

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
from video_diffusion_tpu.data import get_train_dataset
from video_diffusion_tpu.models.wrappers import make_video_model_fn
from video_diffusion_tpu.sampling import inference_strategies
from video_diffusion_tpu.utils import eval_util
from video_diffusion_tpu.utils.protect import Protect
from video_diffusion_tpu.utils.script_util import str2bool


def make_candidate_evaluator(model, diffusion, t_seq):
    """ONE jitted, candidate-vmapped VLB evaluator for the whole search.

    Candidate windows are stacked on a new leading axis and evaluated in a
    single compiled call per greedy iteration; the candidate axis is padded
    to a power-of-two bucket so the number of traces is O(log max_candidates)
    per window width, not one per candidate per iteration (the reference
    evaluates hundreds of candidates one synchronous GPU call at a time,
    video_optimal_schedule.py:142-206)."""

    @jax.jit
    def run(variables, x0s, oms, lms, fis, rngs):
        def one(x0j, omj, lmj, fij, r):
            model_fn = make_video_model_fn(
                model, variables, diffusion,
                x0=x0j, obs_mask=omj, latent_mask=lmj,
                kinda_marg_mask=jnp.zeros_like(omj),
                frame_indices=fij, observed_frames="x_0",
            )
            out = diffusion.calc_bpd_loop_subsampled(
                model_fn, x0j, r, latent_mask=lmj, t_seq=t_seq
            )
            return out["mse"].mean()

        return jax.vmap(one)(x0s, oms, lms, fis, rngs)

    return run


def get_mse_for_candidates(
    evaluator, variables, batch, candidates, base_obs, latent_indices,
    max_frames, rng,
):
    """Masked eps-MSE for each candidate observation set extension, in one
    device call. batch: (B, T, H, W, C); returns (n_candidates,) mean MSE."""
    B = batch.shape[0]
    F = max_frames
    e = (1, 1, 1)
    n = len(candidates)
    n_pad = 1 << max(0, (n - 1).bit_length())  # pow2 bucket: O(log) traces
    x0s = np.zeros((n_pad, B, F) + batch.shape[2:], dtype=np.float32)
    oms = np.zeros((n_pad, B, F, *e), dtype=np.float32)
    lms = np.zeros((n_pad, B, F, *e), dtype=np.float32)
    fis = np.zeros((n_pad, B, F), dtype=np.int32)
    for c, cand in enumerate(candidates):
        obs = sorted(base_obs + [cand])
        window = obs + list(latent_indices)
        x0s[c, :, : len(window)] = batch[:, window]
        oms[c, :, : len(obs)] = 1
        lms[c, :, len(obs) : len(window)] = 1
        fis[c, :, : len(window)] = window
    if n_pad > n:  # pad with copies of the last candidate
        x0s[n:], oms[n:], lms[n:], fis[n:] = x0s[n - 1], oms[n - 1], lms[n - 1], fis[n - 1]
    rngs = jax.random.split(rng, n_pad)
    mses = evaluator(
        variables, jnp.asarray(x0s), jnp.asarray(oms), jnp.asarray(lms),
        jnp.asarray(fis), rngs,
    )
    return np.asarray(mses)[:n]


def main(args):
    (model, variables, diffusion), model_args, _ = eval_util.load_checkpoint(
        args.checkpoint_path, timestep_respacing=args.timestep_respacing
    )
    if args.max_frames is None:
        args.max_frames = model_args.max_frames
    if args.T is None:
        args.T = model_args.T
    # same eval-dir convention as video_sample.py: <base>/<run identifier>
    args.eval_dir = str(
        eval_util.get_model_results_path(args)
        / eval_util.get_eval_run_identifier(args)
    )
    os.makedirs(args.eval_dir, exist_ok=True)
    dataset = get_train_dataset(
        dataset_name=model_args.dataset, T=args.T,
        image_size=getattr(model_args, "image_size", None),
    )
    if args.T is None:
        args.T = dataset[0][0].shape[0]
    batch = np.stack(
        [np.asarray(dataset[i][0]) for i in range(args.num_videos)]
    )[:, : args.T]

    strategy = inference_strategies[args.inference_mode](
        video_length=args.T, num_obs=args.obs_length,
        max_frames=args.max_frames, step_size=args.step_size,
    )
    steps = list(strategy)

    sched_path = Path(args.eval_dir) / "optimal_schedule.pt"
    partial_path = Path(args.eval_dir) / "optimal_schedule_partial.pkl"
    schedule = {}
    if partial_path.exists():
        with Protect(partial_path):
            with open(partial_path, "rb") as f:
                schedule = pickle.load(f)

    if "linspace" in args.optimality:
        t_seq = np.linspace(0, diffusion.num_timesteps - 1, args.num_t).astype(int)[::-1]
    else:
        t_seq = np.sort(
            np.random.RandomState(0).choice(
                diffusion.num_timesteps, args.num_t, replace=False
            )
        )[::-1]

    step_ids = (
        [args.task_id] if args.task_id is not None else range(len(steps))
    )
    done_by_step = []
    done = set(range(args.obs_length))
    for obs_idx, lat_idx in steps:
        done_by_step.append(sorted(done))
        done.update(lat_idx)

    evaluator = make_candidate_evaluator(model, diffusion, t_seq.copy())
    rng = jax.random.PRNGKey(args.seed)
    for s in step_ids:
        if s in schedule or s >= len(steps):
            continue
        obs_idx, lat_idx = steps[s]
        done_frames = done_by_step[s]
        if not done_frames:
            schedule[s] = []
            continue
        n_obs_budget = args.max_frames - len(lat_idx)
        base_obs = []
        if "force-nearby" in args.optimality:
            # pre-pin the nearest done frames before/after the latents
            lo = [i for i in done_frames if i < min(lat_idx)]
            hi = [i for i in done_frames if i > max(lat_idx)]
            if lo:
                base_obs.append(max(lo))
            if hi:
                base_obs.append(min(hi))
        while len(base_obs) < min(n_obs_budget, len(done_frames)):
            candidates = [i for i in done_frames if i not in base_obs]
            if not candidates:
                break
            rng, r = jax.random.split(rng)
            mses = get_mse_for_candidates(
                evaluator, variables, batch, candidates, base_obs,
                lat_idx, args.max_frames, r,
            )
            best = candidates[int(np.argmin(mses))]
            base_obs.append(best)
            print(f"step {s}: obs={sorted(base_obs)} (added {best}, "
                  f"mse={mses.min():.5f})")
        schedule[s] = sorted(base_obs)
        with Protect(partial_path):
            existing = {}
            if partial_path.exists():
                with open(partial_path, "rb") as f:
                    existing = pickle.load(f)
            existing.update(schedule)
            schedule = existing
            with open(partial_path, "wb") as f:
                pickle.dump(schedule, f)

    if len(schedule) >= len(steps):
        with Protect(sched_path):
            with open(sched_path, "wb") as f:
                pickle.dump(schedule, f)
        print(f"wrote {sched_path}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint_path", type=str)
    parser.add_argument("--eval_dir", default=None)
    parser.add_argument("--inference_mode", default="autoreg",
                        choices=inference_strategies.keys())
    parser.add_argument(
        "--optimality", required=True,
        choices=["linspace-t", "random-t",
                 "linspace-t-force-nearby", "random-t-force-nearby"],
    )
    parser.add_argument("--obs_length", type=int, default=36)
    parser.add_argument("--max_frames", type=int, default=None)
    parser.add_argument("--step_size", type=int, default=1)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--num_videos", type=int, default=4)
    parser.add_argument("--num_t", type=int, default=10)
    parser.add_argument("--task_id", type=int, default=None)
    parser.add_argument("--timestep_respacing", type=str, default="")
    parser.add_argument("--use_ddim", type=str2bool, default=False)
    parser.add_argument("--use_gradient_method", action="store_true")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    main(args)
