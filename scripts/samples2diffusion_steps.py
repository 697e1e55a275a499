"""Render all_timestep_sample_*.npy arrays as timestep x frame image grids
(reference scripts/samples2diffusion_steps.py)."""

import argparse
import os
import sys
from pathlib import Path

import numpy as np
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--prefix", default="all_timestep_sample",
                        choices=["all_timestep_sample", "q_sample", "error"])
    parser.add_argument("--every_k_timesteps", type=int, default=50)
    parser.add_argument("--every_k_frames", type=int, default=1)
    args = parser.parse_args()

    samples_dir = Path(args.eval_dir) / "samples"
    out_dir = Path(args.eval_dir) / "diffusion_steps"
    out_dir.mkdir(parents=True, exist_ok=True)
    for p in sorted(samples_dir.glob(f"{args.prefix}_*.npy")):
        arr = np.load(p)  # (K, T, C, H, W)
        arr = arr[:: args.every_k_timesteps, :: args.every_k_frames]
        K, T, C, H, W = arr.shape
        grid = arr.transpose(0, 3, 1, 4, 2).reshape(K * H, T * W, C)
        if grid.dtype != np.uint8:
            grid = np.clip((grid + 1) * 127.5, 0, 255).astype(np.uint8)
        out = out_dir / f"{p.stem}.png"
        Image.fromarray(grid).save(out)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
