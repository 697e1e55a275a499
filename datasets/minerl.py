"""Convert the tfds 'minerl_navigate' dataset into per-video uint8 .npy files
under datasets/minerl_navigate-torch/{train,test}/<i>.npy — the layout
MineRLDataset expects (reference datasets/minerl.py)."""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="datasets/minerl_navigate-torch")
    args = parser.parse_args()

    import tensorflow_datasets as tfds

    data = tfds.load("minerl_navigate")
    for split in ("train", "test"):
        out = os.path.join(args.out_dir, split)
        os.makedirs(out, exist_ok=True)
        i = 0
        for item in tfds.as_numpy(data[split]):
            video = item["video"]  # (T, 64, 64, 3) uint8
            np.save(os.path.join(out, f"{i}.npy"), video)
            i += 1
        print(f"{split}: {i} videos -> {out}")


if __name__ == "__main__":
    main()
