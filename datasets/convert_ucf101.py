"""Convert UCF-101 .avi clips into one HDF5 ('image' dataset, uint8
N x 3 x 64 x 85 frames) plus a JSON index of clip spans — the layout
UCF101Dataset expects (reference datasets/convert_ucf101.py:47-81)."""

import argparse
import glob
import json
import os

import numpy as np


def read_video_frames(path, height=64, width=85):
    import imageio.v2 as imageio
    from PIL import Image

    reader = imageio.get_reader(path)
    frames = []
    for frame in reader:
        img = Image.fromarray(frame).resize((width, height), Image.BILINEAR)
        frames.append(np.moveaxis(np.asarray(img), -1, 0))  # (3, H, W)
    reader.close()
    return np.stack(frames) if frames else None


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ucf_dir", required=True, help="dir of UCF101 .avi files")
    parser.add_argument("--out_dir", default="datasets/ucf101")
    parser.add_argument("--split", default="train", choices=["train", "test"])
    parser.add_argument("--split_file", default=None,
                        help="optional ucfTrainTestlist file restricting clips")
    args = parser.parse_args()

    import h5py

    os.makedirs(args.out_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(args.ucf_dir, "**/*.avi"), recursive=True))
    if args.split_file:
        keep = {
            os.path.basename(l.split()[0])
            for l in open(args.split_file)
            if l.strip()
        }
        files = [f for f in files if os.path.basename(f) in keep]
    h5path = os.path.join(args.out_dir, f"{args.split}.h5")
    index = {"start": {}, "end": {}, "path": {}}
    with h5py.File(h5path, "w") as h5:
        dset = h5.create_dataset(
            "image", shape=(0, 3, 64, 85), maxshape=(None, 3, 64, 85),
            dtype=np.uint8, chunks=(16, 3, 64, 85),
        )
        cursor = 0
        for i, f in enumerate(files):
            frames = read_video_frames(f)
            if frames is None:
                continue
            n = len(frames)
            dset.resize(cursor + n, axis=0)
            dset[cursor : cursor + n] = frames
            index["start"][str(i)] = cursor
            index["end"][str(i)] = cursor + n
            index["path"][str(i)] = os.path.basename(f)
            cursor += n
            print(f"[{i + 1}/{len(files)}] {f}: {n} frames")
    with open(os.path.join(args.out_dir, f"{args.split}.json"), "w") as fp:
        json.dump(index, fp)
    print(f"wrote {h5path}")


if __name__ == "__main__":
    main()
