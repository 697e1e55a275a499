"""Super-resolve a base model's samples (reference scripts/super_res_sample.py):
conditions on low_res images read from a base .npz and writes an upsampled
samples_<shape>.npz."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.models.factory import (
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)
from video_diffusion_tpu.models.wrappers import make_image_model_fn
from video_diffusion_tpu.utils import checkpoint as ckpt_lib
from video_diffusion_tpu.utils import logger
from video_diffusion_tpu.utils.script_util import add_dict_to_argparser, args_to_dict


def load_data_for_worker(base_samples, batch_size, class_cond):
    with np.load(base_samples) as obj:
        image_arr = obj["arr_0"]
        label_arr = obj["arr_1"] if class_cond else None
    buffer, label_buffer = [], []
    while True:
        for i in range(len(image_arr)):
            buffer.append(image_arr[i])
            if class_cond:
                label_buffer.append(label_arr[i])
            if len(buffer) == batch_size:
                batch = np.stack(buffer).astype(np.float32) / 127.5 - 1
                res = {"low_res": batch}
                if class_cond:
                    res["y"] = np.stack(label_buffer)
                yield res
                buffer, label_buffer = [], []


def main():
    args = create_argparser().parse_args()
    logger.configure()

    logger.log("creating model...")
    model, diffusion = sr_create_model_and_diffusion(
        **args_to_dict(args, sr_model_and_diffusion_defaults().keys()),
        use_bf16=args.use_bf16,
    )
    data_ck = ckpt_lib.load_checkpoint(args.model_path)
    state_dict = data_ck["state_dict"] if "state_dict" in data_ck else data_ck
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, state_dict)}

    logger.log("loading data...")
    data = load_data_for_worker(args.base_samples, args.batch_size, args.class_cond)

    logger.log("creating samples...")
    rng = jax.random.PRNGKey(args.seed)
    all_images = []
    shape = (args.batch_size, args.large_size, args.large_size, 3)

    @jax.jit
    def run(variables, rng, low_res, y):
        model_fn = make_image_model_fn(
            model, variables, diffusion, y=y, low_res=low_res
        )
        wrapped = lambda x, t, r: model_fn(x, t)
        loop = (
            diffusion.p_sample_loop if not args.use_ddim
            else diffusion.ddim_sample_loop
        )
        return loop(wrapped, shape, rng, clip_denoised=args.clip_denoised)

    while len(all_images) * args.batch_size < args.num_samples:
        model_kwargs = next(data)
        rng, srng = jax.random.split(rng)
        sample = run(
            variables,
            srng,
            jnp.asarray(model_kwargs["low_res"]),
            jnp.asarray(model_kwargs["y"]) if args.class_cond else None,
        )
        sample = np.clip((np.asarray(sample) + 1) * 127.5, 0, 255).astype(np.uint8)
        all_images.append(sample)
        logger.log(f"created {len(all_images) * args.batch_size} samples")

    arr = np.concatenate(all_images, axis=0)[: args.num_samples]
    out_path = os.path.join(
        logger.get_dir(), f"samples_{'x'.join(map(str, arr.shape))}.npz"
    )
    logger.log(f"saving to {out_path}")
    np.savez(out_path, arr)
    logger.log("sampling complete")


def create_argparser():
    defaults = dict(
        clip_denoised=True,
        num_samples=10000,
        batch_size=16,
        use_ddim=False,
        base_samples="",
        model_path="",
        seed=0,
        use_bf16=True,
        class_cond=False,
    )
    defaults.update(sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
