"""Convert raw GQN tfrecord mazes into per-video tensors (multi-process) —
the layout MazesDataset consumed (reference datasets/process_mazes.py).
The 'mazes' dataset is deprecated in favor of 'mazes_cwvae' (gqn_mazes), like
in the reference (image_datasets.py:179: 'Deprecated dataset.')."""

import argparse
import glob
import os
from multiprocessing import Pool

import numpy as np


def process_record(task):
    record_file, out_dir, start_idx = task
    import tensorflow as tf
    import torch

    i = start_idx
    for record in tf.data.TFRecordDataset([record_file]):
        ex = tf.train.Example()
        ex.ParseFromString(record.numpy())
        frames = [
            np.frombuffer(v, dtype=np.uint8)
            for v in ex.features.feature["frames"].bytes_list.value
        ]
        torch.save(frames, os.path.join(out_dir, f"{i}.pt"))
        i += 1
    return i - start_idx


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--tfrecord_dir", required=True)
    parser.add_argument("--out_dir", default="datasets/mazes-torch/train")
    parser.add_argument("--workers", type=int, default=4)
    parser.add_argument("--videos_per_record", type=int, default=100)
    args = parser.parse_args()

    os.makedirs(args.out_dir, exist_ok=True)
    records = sorted(glob.glob(os.path.join(args.tfrecord_dir, "*.tfrecord*")))
    tasks = [
        (r, args.out_dir, i * args.videos_per_record)
        for i, r in enumerate(records)
    ]
    with Pool(args.workers) as pool:
        counts = pool.map(process_record, tasks)
    print(f"converted {sum(counts)} videos -> {args.out_dir}")


if __name__ == "__main__":
    main()
