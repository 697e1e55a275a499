"""Train a town classifier on CARLA frames (reference
scripts/train_carla_classifier.py): used to evaluate the semantics of
generated CARLA samples. Frames from two (or more) town datasets get class
labels by dataset index."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import optax

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import get_train_dataset
from video_diffusion_tpu.models.probe import ProbeCNN
from video_diffusion_tpu.utils import checkpoint as ckpt_lib
from video_diffusion_tpu.utils import logger


def frame_batches(datasets, batch_size, rng, T_subsample=20):
    while True:
        frames, labels = [], []
        for _ in range(batch_size):
            label = rng.integers(len(datasets))
            ds = datasets[label]
            video, _ = ds[rng.integers(len(ds))]
            frames.append(video[rng.integers(min(len(video), T_subsample))])
            labels.append(label)
        yield np.stack(frames), np.array(labels)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--datasets", nargs="+",
                        default=["carla_no_traffic", "carla_town02_no_traffic"])
    parser.add_argument("--iterations", type=int, default=5000)
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--lr", type=float, default=1e-4)
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--save_path", default="checkpoints/carla_classifier.pt")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()
    logger.configure()

    datasets = [
        get_train_dataset(name, image_size=args.image_size)
        for name in args.datasets
    ]
    model = ProbeCNN(out_dim=len(datasets))
    rng = np.random.default_rng(args.seed)
    batches = frame_batches(datasets, args.batch_size, rng)

    x0, y0 = next(batches)
    params = model.init(jax.random.PRNGKey(args.seed), jnp.asarray(x0))["params"]
    tx = optax.adamw(args.lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=True)
            loss = optax.softmax_cross_entropy_with_integer_labels(logits, y).mean()
            acc = (logits.argmax(-1) == y).mean()
            return loss, acc

        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, acc

    for i in range(args.iterations):
        x, y = next(batches)
        params, opt_state, loss, acc = step(
            params, opt_state, jnp.asarray(x), jnp.asarray(y)
        )
        if i % 50 == 0:
            logger.logkv("step", i)
            logger.logkv("loss", float(loss))
            logger.logkv("acc", float(acc))
            logger.dumpkvs()
    os.makedirs(os.path.dirname(args.save_path), exist_ok=True)
    import pickle

    with open(args.save_path, "wb") as f:
        pickle.dump(
            {"state_dict": ckpt_lib.tree_to_numpy(params),
             "config": vars(args), "step": args.iterations}, f,
        )
    logger.log(f"saved {args.save_path}")


if __name__ == "__main__":
    main()
