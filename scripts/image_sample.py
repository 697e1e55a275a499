"""Sample a batch of images from a trained image model and save to a .npz
(reference scripts/image_sample.py: same samples_<shape>.npz output for FID
pipelines). The whole DDPM/DDIM loop is one jitted lax.scan."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.models.factory import (
    NUM_CLASSES,
    create_model_and_diffusion,
    model_and_diffusion_defaults,
)
from video_diffusion_tpu.models.wrappers import make_image_model_fn
from video_diffusion_tpu.utils import checkpoint as ckpt_lib
from video_diffusion_tpu.utils import logger
from video_diffusion_tpu.utils.script_util import add_dict_to_argparser, args_to_dict


def main():
    args = create_argparser().parse_args()
    logger.configure()

    logger.log("creating model and diffusion...")
    model, diffusion = create_model_and_diffusion(
        **args_to_dict(args, model_and_diffusion_defaults().keys()),
        use_bf16=args.use_bf16,
    )
    data = ckpt_lib.load_checkpoint(args.model_path)
    state_dict = data["state_dict"] if isinstance(data, dict) and "state_dict" in data else data
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, state_dict)}

    logger.log("sampling...")
    rng = jax.random.PRNGKey(args.seed)
    all_images, all_labels = [], []
    shape = (args.batch_size, args.image_size, args.image_size, 3)

    @jax.jit
    def run(variables, rng, y):
        model_fn = make_image_model_fn(
            model, variables, diffusion, y=y if args.class_cond else None
        )
        wrapped = lambda x, t, r: model_fn(x, t)
        loop = (
            diffusion.p_sample_loop
            if not args.use_ddim
            else diffusion.ddim_sample_loop
        )
        return loop(wrapped, shape, rng, clip_denoised=args.clip_denoised)

    while len(all_images) * args.batch_size < args.num_samples:
        rng, crng, srng = jax.random.split(rng, 3)
        y = (
            jax.random.randint(crng, (args.batch_size,), 0, NUM_CLASSES)
            if args.class_cond
            else None
        )
        sample = run(variables, srng, y)
        sample = np.asarray((sample + 1) * 127.5)
        sample = np.clip(sample, 0, 255).astype(np.uint8)  # (B, H, W, C)
        all_images.append(sample)
        if args.class_cond:
            all_labels.append(np.asarray(y))
        logger.log(f"created {len(all_images) * args.batch_size} samples")

    arr = np.concatenate(all_images, axis=0)[: args.num_samples]
    out_path = os.path.join(
        logger.get_dir(), f"samples_{'x'.join(map(str, arr.shape))}.npz"
    )
    logger.log(f"saving to {out_path}")
    if args.class_cond:
        label_arr = np.concatenate(all_labels, axis=0)[: args.num_samples]
        np.savez(out_path, arr, label_arr)
    else:
        np.savez(out_path, arr)
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        clip_denoised=True,
        num_samples=10000,
        batch_size=16,
        use_ddim=False,
        model_path="",
        use_bf16=True,
        seed=0,
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
