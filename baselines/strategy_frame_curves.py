"""Per-frame quality curves from strategy-eval metrics pickles.

The reference's headline qualitative result (flexible-sampling paper, and
/root/reference/scripts/video_eval.py's per-video metric dumps) is how
generation quality degrades with distance from the observed frames, and
how the inference strategies trade that off. Each strategy-eval run
already stores per-frame metrics — metrics_<n>-<s>-<T>.pkl holds
(videos, samples, frames) arrays (eval/metrics.py) — so the curves are
pure postprocessing; no chip time.

Usage:
    python baselines/strategy_frame_curves.py results/strategy-eval-*  \
        [--out results_artifacts/strategy_frame_curves.json]

Each argument is a strategy-eval root (containing <mode>_<mf>_<obs>_<T>_<step>/
metrics_*.pkl). Emits one JSON with, per mode: mean SSIM/PSNR per
generated-frame index (frame 0 = first frame after the observed prefix),
plus coarse near/mid/far band means for the QUALITY.md table.
"""

import argparse
import glob
import json
import os
import pickle

import numpy as np


def load_mode_metrics(root):
    """Return (mode, {metric: (videos, frames) array}) for one eval root."""
    pkls = sorted(glob.glob(os.path.join(root, "*", "metrics_*.pkl")))
    if not pkls:
        raise FileNotFoundError(f"no metrics_*.pkl under {root}")
    sub = os.path.basename(os.path.dirname(pkls[-1]))
    mode = sub.split("_")[0]
    with open(pkls[-1], "rb") as f:
        d = pickle.load(f)
    out = {}
    for k in ("ssim", "psnr", "lpips"):
        if k in d:
            a = np.asarray(d[k])  # (videos, samples, frames)
            out[k] = a.mean(axis=1)  # best/mean over samples axis (s=1 here)
    return mode, out


def band_means(per_frame, bands=((0, 10), (10, 40), (40, None))):
    out = {}
    for lo, hi in bands:
        key = f"f{lo}-{hi if hi is not None else 'end'}"
        out[key] = float(np.mean(per_frame[lo:hi]))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("roots", nargs="+")
    p.add_argument(
        "--out", default="results_artifacts/strategy_frame_curves.json"
    )
    p.add_argument("--tag", default=None, help="checkpoint tag, e.g. step30000")
    args = p.parse_args()

    curves = {}
    for root in args.roots:
        mode, m = load_mode_metrics(root)
        entry = {}
        for k, a in m.items():
            pf = a.mean(axis=0)  # (frames,)
            entry[k + "_per_frame"] = [round(float(v), 5) for v in pf]
            entry[k + "_bands"] = band_means(pf)
        entry["n_videos"] = int(next(iter(m.values())).shape[0])
        curves[mode] = entry

    payload = curves if args.tag is None else {args.tag: curves}
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    merged = {}
    if args.tag is not None and os.path.exists(args.out):
        with open(args.out) as f:
            merged = json.load(f)
    merged.update(payload)
    with open(args.out, "w") as f:
        json.dump(merged, f, indent=1)

    # console table: SSIM bands per mode
    modes = list(curves)
    print(f"{'mode':<14}" + "".join(f"{b:>14}" for b in curves[modes[0]]["ssim_bands"]))
    for mode in modes:
        b = curves[mode]["ssim_bands"]
        print(f"{mode:<14}" + "".join(f"{v:>14.4f}" for v in b.values()))
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
