"""Concatenate chained long-video chunks (video_<k>.npy from
video_sample_long.py) into one rendered video
(reference scripts/samples2video_long.py)."""

import argparse
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from video_diffusion_tpu.utils.eval_util import tensor2gif, tensor2mp4


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--obs_length", type=int, default=10,
                        help="overlap to drop when concatenating chunks")
    parser.add_argument("--format", default="gif", choices=["gif", "mp4"])
    parser.add_argument("--batch_index", type=int, default=0)
    args = parser.parse_args()

    chunk_dir = Path(args.eval_dir) / "long_videos"
    files = sorted(
        chunk_dir.glob("video_*.npy"),
        key=lambda p: int(p.stem.split("_")[1]),
    )
    assert files, f"no chunks in {chunk_dir}"
    pieces = []
    for k, f in enumerate(files):
        arr = np.load(f)[args.batch_index]  # (T, C, H, W)
        if k > 0:
            arr = arr[args.obs_length:]
        pieces.append(arr)
    video = np.concatenate(pieces, axis=0).astype(np.float32)
    out = chunk_dir / f"long_video_{args.batch_index}.{args.format}"
    render = tensor2gif if args.format == "gif" else tensor2mp4
    render(video, out, drange=[0, 255], random_str="long")
    print(f"saved {out} ({video.shape[0]} frames)")


if __name__ == "__main__":
    main()
