"""Write video_train.csv / video_test.csv split files for a CARLA video dir:
last 100 videos become the test split
(reference datasets/carla/make_train_test_split.py:13-37)."""

import argparse
import glob
import os

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("video_dir", help="dir containing video_*.pt files")
    parser.add_argument("--n_test", type=int, default=100)
    args = parser.parse_args()

    names = sorted(
        os.path.basename(p)
        for p in glob.glob(os.path.join(args.video_dir, "video_*.pt"))
    )
    assert len(names) > args.n_test, f"only {len(names)} videos found"
    train, test = names[: -args.n_test], names[-args.n_test:]
    for split, items in (("train", train), ("test", test)):
        path = os.path.join(args.video_dir, f"video_{split}.csv")
        with open(path, "w") as f:
            f.write("\n".join(items) + "\n")
        print(f"wrote {path} ({len(items)} videos)")
