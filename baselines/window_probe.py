"""First-window conditioning probe on REAL test videos.

The decisive capability measurement (VERDICT r2 item 1): condition one
max_frames window on the first ``n_obs`` frames of real test videos, run
the full reverse chain (from noise, t=1000 -> 0), and compare each
generated frame to (a) the ground-truth frame at the same index and (b) an
UNRELATED video's frame at the same index (the floor). A conditioning
model shows SSIM(gen, gt) clearly above SSIM(gen, unrelated-gt) on the
first generated frames, decaying toward the floor with distance (balls
diverge chaotically, so far frames legitimately decorrelate).

QUALITY.md round-2 context: at 100k steps the full-chain samples sat AT
the floor (0.154 vs floor 0.195). This probe isolates the same signal in
one window call per checkpoint (~a minute instead of a full T=100
sampling + eval run).

Usage: python baselines/window_probe.py <ckpt> [<ckpt2> ...] [--T 10]
       [--n_obs 5] [--batch 64] [--seed 0] [--data <test.pt>]

Round-4 breadth fixes (VERDICT r3 "weak" item 3): 64 videos by default
(processed in --chunk-sized device calls so each reverse chain stays under
the tunnel's ~60 s per-call deadline), PSNR reported alongside SSIM, and a
JSON artifact per checkpoint under results_artifacts/ so the QUALITY.md
trend table is reproducible.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoints", nargs="+")
    parser.add_argument("--T", type=int, default=10, help="window size")
    parser.add_argument("--n_obs", type=int, default=5)
    parser.add_argument("--batch", type=int, default=64)
    parser.add_argument("--chunk", type=int, default=16,
                        help="videos per device call (full reverse chain at "
                        "B=16/32x32 is ~40 s — under the tunnel deadline)")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--use_ema", type=lambda s: s.lower() != "false",
                        default=True)
    parser.add_argument("--data", type=str,
                        default="datasets/bouncing_balls_100/test.pt",
                        help=".pt tensor of test videos (N,T,C,H,W) in [0,1]")
    parser.add_argument("--out_dir", type=str, default="results_artifacts")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import torch

    import video_diffusion_tpu.utils  # noqa: F401
    from video_diffusion_tpu.eval.metrics import psnr as psnr_metric
    from video_diffusion_tpu.eval.metrics import ssim as ssim_metric
    from video_diffusion_tpu.models.wrappers import make_video_model_fn
    from video_diffusion_tpu.utils import checkpoint as ckpt_lib
    from video_diffusion_tpu.utils import eval_util

    vids = torch.load(args.data)[: args.batch, : args.T].numpy()  # (B,T,c,H,W)
    if vids.shape[2] == 1:
        vids = np.repeat(vids, 3, axis=2)
    gt = np.transpose(vids, (0, 1, 3, 4, 2)) * 2 - 1  # (B,T,H,W,C) in [-1,1]
    B, T = gt.shape[:2]
    chunk = min(args.chunk, B)

    for ckpt in args.checkpoints:
        # one shared loader for every surface (scripts AND probes) — the
        # config->factory filtering lives in eval_util.load_checkpoint only
        (model, variables, diffusion), model_args, step = (
            eval_util.load_checkpoint(ckpt)
        )
        params = variables["params"]
        if args.use_ema:
            ema_path = ckpt_lib.find_ema_checkpoint(
                ckpt, step,
                str(getattr(model_args, "ema_rate", "0.9999")).split(",")[0],
                save_latest_only="latest" in os.path.basename(ckpt),
            )
            if ema_path:
                params = ckpt_lib.load_checkpoint(ema_path)["state_dict"]
        params = jax.tree_util.tree_map(jnp.asarray, params)

        e = (1, 1, 1)
        obs = jnp.zeros((chunk, T, *e)).at[:, : args.n_obs].set(1.0)
        latent = 1.0 - obs
        marg = jnp.zeros_like(obs)
        fi = jnp.broadcast_to(jnp.arange(T)[None], (chunk, T))

        def sample_fn(p, x0j, r):
            model_fn = make_video_model_fn(
                model, {"params": p}, diffusion, x0=x0j, obs_mask=obs,
                latent_mask=latent, kinda_marg_mask=marg, frame_indices=fi,
                observed_frames=getattr(
                    model_args, "observed_frames", "x_t_minus_1"
                ),
            )
            return diffusion.p_sample_loop(model_fn, x0j.shape, r)

        sample_jit = jax.jit(sample_fn)
        key = jax.random.PRNGKey(args.seed)
        out = np.concatenate(
            [
                np.asarray(
                    sample_jit(
                        params,
                        jnp.asarray(gt[i : i + chunk]),
                        jax.random.fold_in(key, i),
                    )
                )
                for i in range(0, B, chunk)
            ],
            axis=0,
        )

        def frame_metric(metric, a, b):  # (B,H,W,C) pairs -> mean scalar
            vals = [
                metric(a[i, ..., c], b[i, ..., c], data_range=2.0)
                for i in range(B)
                for c in range(a.shape[-1])
            ]
            return float(np.mean(vals))

        gt_roll = np.roll(gt, 1, axis=0)  # unrelated video at same index
        print(f"\n== {ckpt} (step {step}, {B} videos) ==")
        # NOTE: p_sample_loop input-splices observations into every model
        # call (conditioning) but does NOT output-splice them into the
        # returned chain — the production sampler (sampling/sampler.py) does
        # that after the loop. The chain's content at observed positions is
        # therefore the model's own re-synthesis; its MAE vs the true
        # observations is a (loose) self-consistency diagnostic, NOT the
        # "copied exactly" invariant QUALITY.md measures on the full
        # pipeline.
        obs_mae = float(np.abs(out[:, : args.n_obs] - gt[:, : args.n_obs]).mean())
        print(f"chain re-synthesis MAE at observed positions: {obs_mae:.5f}")
        rows = []
        print("frame |  SSIM(gen, gt)  SSIM(unrel)  |  PSNR(gen, gt)  PSNR(unrel)")
        for t in range(args.n_obs, T):
            s_gt = frame_metric(ssim_metric, out[:, t], gt[:, t])
            s_un = frame_metric(ssim_metric, out[:, t], gt_roll[:, t])
            p_gt = frame_metric(psnr_metric, out[:, t], gt[:, t])
            p_un = frame_metric(psnr_metric, out[:, t], gt_roll[:, t])
            marker = " <-- conditioned" if s_gt > s_un + 0.03 else ""
            print(
                f"  t={t}  |  {s_gt:.3f}          {s_un:.3f}      "
                f"|  {p_gt:.2f}          {p_un:.2f}{marker}"
            )
            rows.append(
                dict(frame=t, ssim_gt=s_gt, ssim_unrelated=s_un,
                     psnr_gt=p_gt, psnr_unrelated=p_un)
            )
        if args.out_dir:
            os.makedirs(args.out_dir, exist_ok=True)
            out_path = os.path.join(
                args.out_dir, f"window_probe_{step:06d}.json"
            )
            with open(out_path, "w") as f:
                json.dump(
                    dict(
                        checkpoint=ckpt, step=int(step), n_videos=int(B),
                        n_obs=args.n_obs, T=args.T, seed=args.seed,
                        data=args.data, obs_resynthesis_mae=obs_mae,
                        frames=rows,
                    ),
                    f, indent=1,
                )
            print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
