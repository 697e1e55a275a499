"""Render saved sample_<i>-<k>.npy arrays as gif/mp4/avi
(reference scripts/samples2video.py)."""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from video_diffusion_tpu.utils.eval_util import (
    mark_as_observed,
    tensor2avi,
    tensor2gif,
    tensor2mp4,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--obs_length", type=int, default=0)
    parser.add_argument("--format", default="gif", choices=["gif", "mp4", "avi"])
    parser.add_argument("--indices", type=int, nargs="*", default=None)
    parser.add_argument("--fps", type=int, default=10)
    args = parser.parse_args()

    samples_dir = Path(args.eval_dir) / "samples"
    out_dir = Path(args.eval_dir) / "videos"
    out_dir.mkdir(parents=True, exist_ok=True)
    files = sorted(samples_dir.glob("sample_*.npy"))
    if args.indices is not None:
        keep = set(args.indices)
        files = [
            f for f in files
            if int(f.stem.split("_")[1].split("-")[0]) in keep
        ]
    render = {"gif": tensor2gif, "mp4": tensor2mp4, "avi": tensor2avi}[args.format]
    for f in files:
        arr = np.load(f).astype(np.float32)  # (T, C, H, W) uint8
        if args.obs_length:
            mark_as_observed(arr[: args.obs_length])
        out = out_dir / f"{f.stem}.{args.format}"
        render(arr, out, drange=[0, 255], random_str=f.stem)
        print(f"saved {out}")


if __name__ == "__main__":
    main()
