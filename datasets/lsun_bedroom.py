"""Convert an LSUN bedroom lmdb into flat PNG files
(reference datasets/lsun_bedroom.py). Requires the lmdb package."""

import argparse
import io
import os

from PIL import Image


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("lmdb_path", help="path to the LSUN bedroom lmdb dir")
    parser.add_argument("--out_dir", default="lsun_bedroom")
    parser.add_argument("--image_size", type=int, default=256)
    parser.add_argument("--max_images", type=int, default=None)
    args = parser.parse_args()

    import lmdb

    os.makedirs(args.out_dir, exist_ok=True)
    env = lmdb.open(args.lmdb_path, map_size=1099511627776,
                    max_readers=100, readonly=True)
    i = 0
    with env.begin(write=False) as txn:
        for _, val in txn.cursor():
            img = Image.open(io.BytesIO(val)).convert("RGB")
            # center crop to square then resize
            w, h = img.size
            s = min(w, h)
            img = img.crop(((w - s) // 2, (h - s) // 2,
                            (w + s) // 2, (h + s) // 2))
            img = img.resize((args.image_size, args.image_size), Image.BICUBIC)
            img.save(os.path.join(args.out_dir, f"bedroom_{i:07d}.png"))
            i += 1
            if args.max_images and i >= args.max_images:
                break
    print(f"wrote {i} images -> {args.out_dir}")


if __name__ == "__main__":
    main()
