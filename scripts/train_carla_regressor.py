"""Train an ego-coordinate regressor on CARLA frames (reference
scripts/train_carla_regressor.py): predicts the ego (x, y) coordinates from a
single frame, used to probe the spatial consistency of generated videos.
Expects coords_<i>.npy files next to the videos (written by scripts/carla.py)."""

import argparse
import glob
import os
import pickle
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data.datasets import _data_root, video_data_paths_dict
from video_diffusion_tpu.models.probe import ProbeCNN
from video_diffusion_tpu.utils import checkpoint as ckpt_lib
from video_diffusion_tpu.utils import logger


def load_videos_with_coords(dataset_name, image_size, max_videos=None):
    import torch

    root = Path(_data_root(video_data_paths_dict[dataset_name]))
    coord_files = sorted(glob.glob(str(root / "coords_*.npy")))
    if max_videos:
        coord_files = coord_files[:max_videos]
    videos, coords = [], []
    for cf in coord_files:
        vid = cf.replace("coords_", "video_").replace(".npy", ".pt")
        if not os.path.exists(vid):
            continue
        arr = torch.load(vid, map_location="cpu", weights_only=False)
        arr = np.asarray(arr.numpy() if hasattr(arr, "numpy") else arr)
        videos.append(arr.astype(np.float32) / 255 * 2 - 1)
        coords.append(np.load(cf).astype(np.float32))
    assert videos, f"no coords_*.npy found under {root} (run scripts/carla.py)"
    return videos, coords


def main(multihead=False):
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="carla_no_traffic")
    parser.add_argument("--datasets", nargs="+", default=None,
                        help="multihead: one dataset per head")
    parser.add_argument("--iterations", type=int, default=5000)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--max_videos", type=int, default=None)
    parser.add_argument("--save_path", default=None)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    logger.configure()

    names = args.datasets if (multihead and args.datasets) else [args.dataset]
    data = [
        load_videos_with_coords(n, args.image_size, args.max_videos)
        for n in names
    ]
    n_heads = len(names) if multihead else 1
    model = ProbeCNN(out_dim=2, n_heads=n_heads)
    rng = np.random.default_rng(args.seed)

    def batch():
        frames, targets, heads = [], [], []
        for _ in range(args.batch_size):
            head = rng.integers(len(data))
            videos, coords = data[head]
            v = rng.integers(len(videos))
            t = rng.integers(len(videos[v]))
            frames.append(videos[v][t])
            targets.append(coords[v][t][:2])
            heads.append(head)
        return (
            np.stack(frames),
            np.stack(targets),
            np.array(heads),
        )

    x0, y0, h0 = batch()
    params = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(x0))["params"]
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, head):
        def loss_fn(p):
            pred = model.apply({"params": p}, x, train=True)
            if n_heads > 1:
                pred = jnp.take_along_axis(
                    pred, head[:, None, None], axis=1
                ).squeeze(1)
            return ((pred - y) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    for i in range(args.iterations):
        x, y, h = batch()
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y), jnp.asarray(h)
        )
        if i % 50 == 0:
            logger.logkv("step", i)
            logger.logkv("mse", float(loss))
            logger.dumpkvs()
    save_path = args.save_path or (
        "checkpoints/carla_regressor%s.pt" % ("_multihead" if multihead else "")
    )
    os.makedirs(os.path.dirname(save_path), exist_ok=True)
    with open(save_path, "wb") as f:
        pickle.dump(
            {"state_dict": ckpt_lib.tree_to_numpy(params),
             "config": vars(args), "step": args.iterations}, f,
        )
    logger.log(f"saved {save_path}")


if __name__ == "__main__":
    main(multihead=False)
