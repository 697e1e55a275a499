"""Print metric means from a metrics pickle (reference scripts/read_eval.py)."""

import argparse
import pickle

import numpy as np

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str, help="metrics_<n>-<k>-<T>.pkl")
    args = parser.parse_args()
    with open(args.path, "rb") as f:
        metrics = pickle.load(f)
    for name, arr in sorted(metrics.items()):
        if name.startswith("_provenance/"):
            print(f"{name}: {arr}")
            continue
        arr = np.asarray(arr)
        # best-over-samples then mean-over-videos, plus the plain mean
        if arr.ndim == 3 and arr.shape[1] > 0:
            per_video = arr.mean(axis=2)
            best = per_video.max(axis=1) if name in ("ssim", "psnr") else per_video.min(axis=1)
            print(f"{name:8s} mean={arr.mean():.4f} best-of-samples={best.mean():.4f}")
        else:
            print(f"{name:8s} mean={arr.mean():.4f}")
