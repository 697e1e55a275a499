"""Standalone FVD between a samples directory and the test set
(reference scripts/video_fvd.py): writes fvd-<num_videos>-<sample_idx>.txt
into the eval dir."""

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np
from tqdm.auto import tqdm

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_test_dataset
from video_diffusion_tpu.eval.i3d import FVDFeatureExtractor


def main(args):
    if args.dataset is None:
        with open(Path(args.eval_dir) / "model_config.json") as f:
            args.dataset = json.load(f)["dataset"]
    dataset = get_test_dataset(dataset_name=args.dataset, T=args.T)
    samples_dir = Path(args.eval_dir) / "samples"
    files = sorted(samples_dir.glob(f"sample_*-{args.sample_idx}.npy"))
    if args.num_videos is not None:
        files = files[: args.num_videos]
    assert files, f"no samples found in {samples_dir}"

    fx = FVDFeatureExtractor(batch_size=args.batch_size)
    pred_feats, gt_feats = [], []
    for p in tqdm(files, desc="FVD features"):
        vid_idx = int(p.stem.split("_")[1].split("-")[0])
        pred = np.load(p).astype(np.float32) / 255.0 * 2 - 1  # (T, C, H, W)
        pred = np.moveaxis(pred, 1, -1)[None]
        gt, _ = dataset[vid_idx]
        gt = np.asarray(gt)[None][:, : pred.shape[1]]
        pred_feats.append(fx.extract_features(pred))
        gt_feats.append(fx.extract_features(gt))
    fvd = fx.compute_fvd(np.concatenate(pred_feats), np.concatenate(gt_feats))
    out = Path(args.eval_dir) / f"fvd-{len(files)}-{args.sample_idx}.txt"
    with open(out, "w") as f:
        f.write(f"{fvd}\n")
        f.write(f"# i3d-features: {fx.provenance}\n")
    print(f"FVD = {fvd:.3f} ({fx.provenance}) -> {out}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument("--sample_idx", type=int, default=0)
    parser.add_argument("--num_videos", type=int, default=None)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    main(parser.parse_args())
