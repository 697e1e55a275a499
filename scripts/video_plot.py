"""Extract frames from rendered gifs into a paper-style matplotlib array PDF
(reference scripts/video_plot.py)."""

import argparse
from pathlib import Path

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("gifs", nargs="+", help="gif files, one row each")
    parser.add_argument("--frames", type=int, nargs="*", default=None,
                        help="frame indices to show (default: 8 evenly spaced)")
    parser.add_argument("--out", default="video_plot.pdf")
    args = parser.parse_args()

    import imageio
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = []
    for g in args.gifs:
        frames = list(imageio.mimread(g, memtest=False))
        idx = args.frames or np.linspace(0, len(frames) - 1, 8).astype(int)
        rows.append([np.asarray(frames[i]) for i in idx])

    n_rows, n_cols = len(rows), len(rows[0])
    fig, axes = plt.subplots(
        n_rows, n_cols, figsize=(1.2 * n_cols, 1.2 * n_rows), squeeze=False
    )
    for r, row in enumerate(rows):
        for c, frame in enumerate(row):
            axes[r][c].imshow(frame)
            axes[r][c].axis("off")
    fig.tight_layout(pad=0.1)
    fig.savefig(args.out, bbox_inches="tight")
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
