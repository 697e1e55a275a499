"""Dump a ground-truth video from a dataset as uint8 .npy
(reference scripts/video_from_dataset.py)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from video_diffusion_tpu.data import get_test_dataset, get_train_dataset

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--partition", default="test", choices=["train", "test"])
    parser.add_argument("--index", type=int, default=0)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    get_ds = get_test_dataset if args.partition == "test" else get_train_dataset
    ds = get_ds(dataset_name=args.dataset, T=args.T)
    video, _ = ds[args.index]
    video = np.clip((np.asarray(video) + 1) * 127.5, 0, 255).astype(np.uint8)
    video = np.moveaxis(video, -1, 1)  # (T, C, H, W)
    out = args.out or f"{args.dataset}_{args.partition}_{args.index}.npy"
    np.save(out, video)
    print(f"saved {out} {video.shape}")
