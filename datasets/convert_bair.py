"""Convert BAIR robot-pushing tfrecords into per-clip .pt video tensors plus
train/test CSV split files — the layout BairPushingDataset expects
(reference datasets/convert_bair.py writes PNG dirs; our loader consumes the
carla-style .pt + csv layout, so this converter emits that directly)."""

import argparse
import glob
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bair_dir", required=True,
                        help="dir with softmotion30_44k tfrecords")
    parser.add_argument("--out_dir", default="datasets/bair_pushing")
    args = parser.parse_args()

    import tensorflow as tf
    import torch

    for split in ("train", "test"):
        rec_glob = os.path.join(args.bair_dir, split, "*.tfrecord*")
        files = sorted(glob.glob(rec_glob))
        assert files, f"no tfrecords match {rec_glob}"
        out_split = os.path.join(args.out_dir, split)
        os.makedirs(out_split, exist_ok=True)
        names = []
        clip = 0
        for rf in files:
            for record in tf.data.TFRecordDataset([rf]):
                ex = tf.train.Example()
                ex.ParseFromString(record.numpy())
                frames = []
                t = 0
                while True:
                    key = f"{t}/image_aux1/encoded"
                    if key not in ex.features.feature:
                        break
                    raw = ex.features.feature[key].bytes_list.value[0]
                    frames.append(
                        np.frombuffer(raw, dtype=np.uint8).reshape(64, 64, 3)
                    )
                    t += 1
                if not frames:
                    continue
                video = np.stack(frames)  # (T, 64, 64, 3) uint8
                name = f"video_{clip:05d}.pt"
                torch.save(torch.from_numpy(video), os.path.join(out_split, name))
                names.append(name)
                clip += 1
        csv = os.path.join(out_split, f"video_{split}.csv")
        with open(csv, "w") as f:
            f.write("\n".join(names) + "\n")
        print(f"{split}: {len(names)} clips -> {out_split}")


if __name__ == "__main__":
    main()
