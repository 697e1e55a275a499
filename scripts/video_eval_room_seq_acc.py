"""GQN-Mazes 3-class semantic sequence accuracy
(reference scripts/video_eval_room_seq_acc.py): classify each generated video
as room-stay / hallway-enter-stay / hallway-enter-recover by counting green
hallway pixels in HSV space, and compare against the ground-truth class."""

import argparse
import colorsys
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from video_diffusion_tpu.data import get_test_dataset


def rgb_to_hsv(frames):
    """frames: (..., 3) float [0,1] -> hsv (..., 3)."""
    r, g, b = frames[..., 0], frames[..., 1], frames[..., 2]
    maxc = frames.max(axis=-1)
    minc = frames.min(axis=-1)
    v = maxc
    delta = maxc - minc
    s = np.where(maxc > 0, delta / np.maximum(maxc, 1e-9), 0)
    rc = np.where(delta > 0, (maxc - r) / np.maximum(delta, 1e-9), 0)
    gc = np.where(delta > 0, (maxc - g) / np.maximum(delta, 1e-9), 0)
    bc = np.where(delta > 0, (maxc - b) / np.maximum(delta, 1e-9), 0)
    h = np.where(
        maxc == r, bc - gc, np.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = (h / 6.0) % 1.0
    h = np.where(delta == 0, 0.0, h)
    return np.stack([h, s, v], axis=-1)


def green_fraction(video):
    """Fraction of 'hallway green' pixels per frame; video (T, H, W, 3) [0,1]."""
    hsv = rgb_to_hsv(video)
    green = (
        (hsv[..., 0] > 0.2) & (hsv[..., 0] < 0.45)
        & (hsv[..., 1] > 0.3) & (hsv[..., 2] > 0.2)
    )
    return green.mean(axis=(1, 2))


def classify(video, enter_thresh=0.05):
    """0 = stays in room, 1 = enters hallway and stays, 2 = enters hallway and
    returns to a room."""
    frac = green_fraction(video)
    in_hall = frac > enter_thresh
    if not in_hall.any():
        return 0
    last_hall = np.nonzero(in_hall)[0].max()
    if last_hall >= len(frac) - max(3, len(frac) // 10):
        return 1
    return 2


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="mazes_cwvae")
    parser.add_argument("--obs_length", type=int, default=36)
    parser.add_argument("--T", type=int, default=None)
    args = parser.parse_args()

    dataset = get_test_dataset(dataset_name=args.dataset, T=args.T)
    samples_dir = Path(args.eval_dir) / "samples"
    files = sorted(samples_dir.glob("sample_*.npy"))
    correct, total = 0, 0
    for p in files:
        vid_idx = int(p.stem.split("_")[1].split("-")[0])
        pred = np.load(p).astype(np.float32) / 255.0  # (T, C, H, W)
        pred = np.moveaxis(pred, 1, -1)[args.obs_length:]
        gt, _ = dataset[vid_idx]
        gt = (np.asarray(gt) + 1) / 2
        gt = gt[args.obs_length : args.obs_length + len(pred)]
        if classify(pred) == classify(gt):
            correct += 1
        total += 1
    acc = correct / max(total, 1)
    out = Path(args.eval_dir) / "room_seq_acc.txt"
    with open(out, "w") as f:
        f.write(f"{acc}\n")
    print(f"sequence accuracy: {acc:.4f} over {total} samples -> {out}")


if __name__ == "__main__":
    main()
