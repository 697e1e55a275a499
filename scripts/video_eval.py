"""Evaluate generated samples against ground truth: SSIM, PSNR, LPIPS, FVD.

Output contract matches /root/reference/scripts/video_eval.py: per-metric
arrays of shape (num_videos, num_samples, T-obs_length) merged into
<eval_dir>/metrics_<num_videos>-<num_samples>-<T>.pkl under a FileLock.
Metrics run on-TPU via the Flax LPIPS/I3D implementations
(video_diffusion_tpu/eval/); SSIM/PSNR are skimage-compatible numpy.
"""

import argparse
import json
import os
import pickle
import sys
from collections import OrderedDict
from pathlib import Path

import numpy as np
from tqdm.auto import tqdm

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_test_dataset, get_train_dataset
from video_diffusion_tpu.eval import metrics
from video_diffusion_tpu.eval.metrics import psnr as psnr_metric
from video_diffusion_tpu.eval.metrics import ssim as ssim_metric
from video_diffusion_tpu.utils.protect import Protect


class LazyDataFetch:
    """Pairs each ground-truth video with all its sample_<i>-<k>.npy files
    (reference video_eval.py:26-99). Videos returned as float [0, 1],
    (T, C, H, W)."""

    def __init__(self, dataset, eval_dir, obs_length, dataset_drange,
                 drop_obs=True, num_samples=None):
        self.dataset = dataset
        self.eval_dir = Path(eval_dir)
        self.obs_length = obs_length
        self.dataset_drange = dataset_drange
        self.drop_obs = drop_obs
        samples = sorted((self.eval_dir / "samples").glob("sample_*.npy"))
        self.by_video = OrderedDict()
        for p in samples:
            stem = p.stem  # sample_0013-2
            vid = int(stem.split("_")[1].split("-")[0])
            self.by_video.setdefault(vid, []).append(p)
        if num_samples is not None:
            for vid in self.by_video:
                assert len(self.by_video[vid]) >= num_samples, (
                    f"video {vid}: expected >= {num_samples} samples, "
                    f"found {len(self.by_video[vid])}"
                )
        self.video_ids = list(self.by_video.keys())

    def __len__(self):
        return len(self.video_ids)

    def __getitem__(self, i):
        vid = self.video_ids[i]
        gt, _ = self.dataset[vid]
        gt = np.asarray(gt)  # (T, H, W, C) in dataset drange
        lo, hi = self.dataset_drange
        gt = (gt - lo) / (hi - lo)  # -> [0, 1]
        gt = np.moveaxis(gt, -1, 1)  # (T, C, H, W)
        preds = OrderedDict()
        for p in self.by_video[vid]:
            arr = np.load(p).astype(np.float32) / 255.0  # (T, C, H, W)
            preds[p.stem] = arr
        if self.drop_obs:
            gt = gt[self.obs_length:]
            preds = OrderedDict(
                (k, v[self.obs_length:]) for k, v in preds.items()
            )
        return {"gt": gt, "preds": preds}


def compute_metrics_lazy(data_fetch, T, num_samples, C=3):
    T = T - data_fetch.obs_length
    num_videos = len(data_fetch)
    ssim = np.zeros((num_videos, num_samples, T))
    psnr = np.zeros((num_videos, num_samples, T))
    for i in tqdm(range(num_videos), desc="SSIM and PSNR"):
        data = data_fetch[i]
        gt = data["gt"]
        preds = list(data["preds"].values())[:num_samples]
        for k, pred in enumerate(preds):
            for t in range(T):
                for c in range(C):
                    ssim[i, k, t] += ssim_metric(gt[t, c], pred[t, c])
                    psnr[i, k, t] += psnr_metric(gt[t, c], pred[t, c])
                psnr[i, k, t] /= C
                ssim[i, k, t] /= C
    return {"ssim": ssim, "psnr": psnr}


def compute_lpips_lazy(data_fetch, T, num_samples):
    from video_diffusion_tpu.eval.lpips import LPIPS

    T = T - data_fetch.obs_length
    num_videos = len(data_fetch)
    lpips = np.zeros((num_videos, num_samples, T))
    loss_fn = LPIPS()
    print(f"LPIPS feature weights: {loss_fn.provenance}")
    for i in tqdm(range(num_videos), desc="LPIPS"):
        data = data_fetch[i]
        gt = data["gt"][:T] * 2 - 1  # (T, C, H, W) -> [-1, 1]
        gt = np.moveaxis(gt, 1, -1)
        preds = list(data["preds"].values())[:num_samples]
        for k, pred in enumerate(preds):
            p = np.moveaxis(pred[:T] * 2 - 1, 1, -1)
            lpips[i, k, :] = loss_fn(gt, p)
    return {"lpips": lpips, "_provenance/lpips": loss_fn.provenance}


def compute_fvd_lazy(data_fetch, T, num_samples, batch_size=8):
    from video_diffusion_tpu.eval.i3d import FVDFeatureExtractor

    fx = FVDFeatureExtractor(batch_size=batch_size)
    print(f"FVD (I3D) feature weights: {fx.provenance}")
    num_videos = len(data_fetch)
    T_eff = T - data_fetch.obs_length
    gt_feats = []
    pred_feats = [[] for _ in range(num_samples)]
    for i in tqdm(range(num_videos), desc="FVD features"):
        data = data_fetch[i]
        gt = np.moveaxis(data["gt"][:T_eff], 1, -1)[None] * 2 - 1
        gt_feats.append(fx.extract_features(gt))
        preds = list(data["preds"].values())[:num_samples]
        for k, pred in enumerate(preds):
            p = np.moveaxis(pred[:T_eff], 1, -1)[None] * 2 - 1
            pred_feats[k].append(fx.extract_features(p))
    gt_features = np.concatenate(gt_feats)
    fvd = np.zeros(num_samples)
    kid = np.zeros(num_samples)
    degenerate = False
    for k in range(num_samples):
        feats = np.concatenate(pred_feats[k])
        degenerate = degenerate or metrics.frechet_degenerate(feats, gt_features)
        fvd[k] = fx.compute_fvd(feats, gt_features)
        # KID (unbiased polynomial-kernel MMD^2, reference
        # frechet_video_distance.py:215-327) from the same feature pass:
        # unlike the 400-d Frechet estimate it is unbiased at small N, so
        # it is the distributional metric of record when fvd_degenerate.
        kid[k] = fx.compute_kid(feats, gt_features)
    out = {"fvd": fvd.reshape(1, num_samples, 1),
           "kid": kid.reshape(1, num_samples, 1),
           "_provenance/fvd": fx.provenance}
    if degenerate:
        # rank-deficient covariance: the value is ~0 regardless of data
        out["_provenance/fvd_degenerate"] = True
    return out


def main(args):
    cfg = {}
    cfg_path = Path(args.eval_dir) / "model_config.json"
    if cfg_path.exists():
        with open(cfg_path) as f:
            cfg = json.load(f)
    if args.dataset is None:
        if "dataset" not in cfg:
            raise ValueError(
                f"Cannot infer the dataset: {cfg_path} is missing or has no "
                "'dataset' key — pass --dataset explicitly."
            )
        args.dataset = cfg["dataset"]
    if args.image_size is None:
        args.image_size = cfg.get("image_size")  # honour train-time override
    get_ds = get_test_dataset if args.dataset_partition == "test" else get_train_dataset
    dataset = get_ds(
        dataset_name=args.dataset, T=args.T, image_size=args.image_size
    )
    data_fetch = LazyDataFetch(
        dataset=dataset,
        eval_dir=args.eval_dir,
        obs_length=args.obs_length,
        dataset_drange=[-1, 1],
        num_samples=args.num_samples,
    )
    if args.num_samples is None:
        args.num_samples = min(
            len(v) for v in data_fetch.by_video.values()
        )
    if args.T is None:
        args.T = data_fetch[0]["gt"].shape[0] + args.obs_length

    new_metrics = {}
    for name in args.modes:
        if name == "ssim":  # computes both ssim and psnr
            new_metrics.update(
                compute_metrics_lazy(data_fetch, args.T, args.num_samples)
            )
        elif name == "lpips":
            new_metrics.update(
                compute_lpips_lazy(data_fetch, args.T, args.num_samples)
            )
        elif name == "fvd":
            new_metrics.update(
                compute_fvd_lazy(data_fetch, args.T, args.num_samples)
            )

    pkl_path = (
        Path(args.eval_dir)
        / f"metrics_{len(data_fetch)}-{args.num_samples}-{args.T}.pkl"
    )
    with Protect(pkl_path):
        metrics = {}
        if pkl_path.exists():
            with open(pkl_path, "rb") as f:
                metrics = pickle.load(f)
        metrics.update(new_metrics)
        with open(pkl_path, "wb") as f:
            pickle.dump(metrics, f)
    print(f"Saved metrics to {pkl_path}")
    for k, v in new_metrics.items():
        if k.startswith("_provenance/"):
            print(f"{k}: {v}")
        else:
            print(f"{k}: {np.mean(v):.4f}")
    # wandb logging, when available (reference video_eval.py:335-386)
    try:
        import wandb

        if wandb.run is None and os.environ.get("WANDB_PROJECT"):
            wandb.init(project=os.environ["WANDB_PROJECT"],
                       name=str(args.eval_dir))
        if wandb.run is not None:
            wandb.log({f"eval/{k}": float(np.mean(v))
                       for k, v in new_metrics.items()
                       if not k.startswith("_provenance/")})
    except ImportError:
        pass


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_dir", type=str, required=True)
    parser.add_argument("--dataset", type=str, default=None)
    parser.add_argument(
        "--dataset_partition", default="test", choices=["train", "test"]
    )
    parser.add_argument(
        "--modes", nargs="+", default=["ssim", "lpips", "fvd"],
        choices=["ssim", "lpips", "fvd"],
    )
    parser.add_argument("--obs_length", type=int, required=True)
    parser.add_argument("--image_size", type=int, default=None)
    parser.add_argument("--T", type=int, default=None)
    parser.add_argument("--num_samples", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=8)
    main(parser.parse_args())
