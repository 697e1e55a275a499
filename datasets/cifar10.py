"""Dump CIFAR-10 as class-named PNG files (cifar_train/<class>_<i>.png) — the
layout load_data's class-from-filename convention expects
(reference datasets/cifar10.py)."""

import argparse
import os
import pickle
import tarfile

import numpy as np
from PIL import Image

CLASSES = (
    "plane", "car", "bird", "cat", "deer", "dog", "frog", "horse", "ship",
    "truck",
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--tarball", required=True,
        help="local cifar-10-python.tar.gz (no network access assumed)",
    )
    parser.add_argument("--out_dir", default=".")
    args = parser.parse_args()

    with tarfile.open(args.tarball) as tf_:
        members = {m.name: m for m in tf_.getmembers()}
        for split, parts in (
            ("train", [f"cifar-10-batches-py/data_batch_{i}" for i in range(1, 6)]),
            ("test", ["cifar-10-batches-py/test_batch"]),
        ):
            out = os.path.join(args.out_dir, f"cifar_{split}")
            os.makedirs(out, exist_ok=True)
            i = 0
            for part in parts:
                with tf_.extractfile(members[part]) as f:
                    batch = pickle.load(f, encoding="bytes")
                images = batch[b"data"].reshape(-1, 3, 32, 32)
                labels = batch[b"labels"]
                for img, label in zip(images, labels):
                    arr = np.moveaxis(img, 0, -1)
                    Image.fromarray(arr).save(
                        os.path.join(out, f"{CLASSES[label]}_{i:05d}.png")
                    )
                    i += 1
            print(f"{split}: {i} images -> {out}")


if __name__ == "__main__":
    main()
