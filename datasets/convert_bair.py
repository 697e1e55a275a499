"""Convert BAIR robot-pushing tfrecords for BairPushingDataset. Two output
layouts (the loader reads both):

* ``--layout pt`` (default): per-clip .pt tensors + video_<split>.csv, the
  carla-style layout the reference's own BairPushingDataset consumes
  (reference image_datasets.py:573-609);
* ``--layout png``: the reference converter's per-clip PNG tree
  ``<split>/<tfrecord-stem>/<k>/<i>.png``
  (reference datasets/convert_bair.py:15-59), byte-compatible with data
  already converted by the reference tooling.
"""

import argparse
import glob
import os

import numpy as np


def _iter_clips(tf, rec_file):
    for record in tf.data.TFRecordDataset([rec_file]):
        ex = tf.train.Example()
        ex.ParseFromString(record.numpy())
        frames = []
        t = 0
        while True:
            key = f"{t}/image_aux1/encoded"
            if key not in ex.features.feature:
                break
            raw = ex.features.feature[key].bytes_list.value[0]
            frames.append(np.frombuffer(raw, dtype=np.uint8).reshape(64, 64, 3))
            t += 1
        if frames:
            yield np.stack(frames)  # (T, 64, 64, 3) uint8


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--bair_dir", required=True,
                        help="dir with softmotion30_44k tfrecords")
    parser.add_argument("--out_dir", default="datasets/bair_pushing")
    parser.add_argument("--layout", choices=("pt", "png"), default="pt")
    args = parser.parse_args()

    import tensorflow as tf

    if args.layout == "pt":
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
            stem = os.path.basename(rf).rsplit(".tfrecords", 1)[0]
            k = 0
            for video in _iter_clips(tf, rf):
                if args.layout == "png":
                    from PIL import Image

                    k += 1
                    clip_dir = os.path.join(out_split, stem, str(k))
                    os.makedirs(clip_dir, exist_ok=True)
                    for i, frame in enumerate(video):
                        Image.fromarray(frame).save(
                            os.path.join(clip_dir, f"{i}.png")
                        )
                else:
                    name = f"video_{clip:05d}.pt"
                    torch.save(
                        torch.from_numpy(video), os.path.join(out_split, name)
                    )
                    names.append(name)
                clip += 1
        if args.layout == "pt":
            csv = os.path.join(out_split, f"video_{split}.csv")
            with open(csv, "w") as f:
                f.write("\n".join(names) + "\n")
        print(f"{split}: {clip} clips -> {out_split} ({args.layout})")


if __name__ == "__main__":
    main()
