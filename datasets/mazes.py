"""Convert GQN-Mazes videos into per-video uint8 .npy files under
datasets/gqn_mazes-torch/{train,test}/<i>.npy — the layout GQNMazesDataset
expects (reference datasets/mazes.py, which builds a tfds dataset from the
archive.org zip of the CW-VAE release).

Two input modes:
  --zip <path>   extract from a local gqn_mazes zip (train/ and test/ mp4s)
  --tfds         use a prebuilt tfds 'gqn_mazes' dataset if registered
"""

import argparse
import glob
import os
import zipfile

import numpy as np


def _convert_mp4_dir(src_dir, out_dir):
    import imageio.v2 as imageio

    os.makedirs(out_dir, exist_ok=True)
    files = sorted(glob.glob(os.path.join(src_dir, "*.mp4")))
    for i, f in enumerate(files):
        reader = imageio.get_reader(f)
        frames = np.stack([frame for frame in reader])  # (T, H, W, 3) uint8
        reader.close()
        np.save(os.path.join(out_dir, f"{i}.npy"), frames)
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{len(files)}")
    print(f"{src_dir}: {len(files)} videos -> {out_dir}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--zip", default=None, help="local gqn_mazes zip file")
    parser.add_argument("--tfds", action="store_true")
    parser.add_argument("--out_dir", default="datasets/gqn_mazes-torch")
    args = parser.parse_args()

    if args.zip:
        tmp = args.out_dir + "-extract"
        with zipfile.ZipFile(args.zip) as zf:
            zf.extractall(tmp)
        for split in ("train", "test"):
            src = glob.glob(os.path.join(tmp, "**", split), recursive=True)
            assert src, f"no {split}/ dir found in {args.zip}"
            _convert_mp4_dir(src[0], os.path.join(args.out_dir, split))
    elif args.tfds:
        import tensorflow_datasets as tfds

        data = tfds.load("gqn_mazes")
        for split in ("train", "test"):
            out = os.path.join(args.out_dir, split)
            os.makedirs(out, exist_ok=True)
            i = 0
            for item in tfds.as_numpy(data[split]):
                np.save(os.path.join(out, f"{i}.npy"), item["video"])
                i += 1
            print(f"{split}: {i} videos -> {out}")
    else:
        raise SystemExit("pass --zip <file> or --tfds")


if __name__ == "__main__":
    main()
