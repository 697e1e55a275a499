"""Render a grid array of n videos x n seeds (+ ground truth with red
observed borders) from saved samples (reference scripts/samples2video_array.py)."""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from video_diffusion_tpu.data import get_test_dataset
from video_diffusion_tpu.utils.eval_util import mark_as_observed, tensor2gif


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--obs_length", type=int, default=0)
    parser.add_argument("--n_videos", type=int, default=4)
    parser.add_argument("--n_seeds", type=int, default=2)
    parser.add_argument("--add_gt", action="store_true")
    parser.add_argument("--T", type=int, default=None)
    args = parser.parse_args()

    samples_dir = Path(args.eval_dir) / "samples"
    rows = []
    for vid in range(args.n_videos):
        row = []
        if args.add_gt:
            import json

            if args.dataset is None:
                with open(Path(args.eval_dir) / "model_config.json") as f:
                    args.dataset = json.load(f)["dataset"]
            ds = get_test_dataset(args.dataset, T=args.T)
            gt, _ = ds[vid]
            gt = np.clip((np.asarray(gt) + 1) * 127.5, 0, 255).astype(np.uint8)
            gt = np.moveaxis(gt, -1, 1).astype(np.float32)  # (T, C, H, W)
            mark_as_observed(gt[: args.obs_length])
            row.append(gt)
        for seed in range(args.n_seeds):
            p = samples_dir / f"sample_{vid:04d}-{seed}.npy"
            arr = np.load(p).astype(np.float32)
            if args.obs_length:
                mark_as_observed(arr[: args.obs_length])
            row.append(arr)
        rows.append(np.concatenate(row, axis=3))  # side by side (W axis)
    grid = np.concatenate(rows, axis=2)  # stacked (H axis)
    out = Path(args.eval_dir) / "videos"
    out.mkdir(exist_ok=True, parents=True)
    path = out / f"array_{args.n_videos}x{args.n_seeds}.gif"
    tensor2gif(grid, path, drange=[0, 255], random_str="array")
    print(f"saved {path}")


if __name__ == "__main__":
    main()
