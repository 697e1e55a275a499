"""Evaluate image-model NLL (bits/dim) over a dataset
(reference scripts/image_nll.py): full VLB per batch, mean across processes."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import load_data
from video_diffusion_tpu.models.factory import (
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
    data_ck = ckpt_lib.load_checkpoint(args.model_path)
    state_dict = data_ck["state_dict"] if "state_dict" in data_ck else data_ck
    variables = {"params": jax.tree_util.tree_map(jnp.asarray, state_dict)}

    logger.log("creating data loader...")
    data = load_data(
        data_dir=args.data_dir,
        batch_size=args.batch_size,
        image_size=args.image_size,
        class_cond=args.class_cond,
        deterministic=True,
    )

    logger.log("evaluating...")
    rng = jax.random.PRNGKey(args.seed)
    all_bpd, all_metrics = [], {"vb": [], "mse": [], "xstart_mse": []}
    num_complete = 0
    while num_complete < args.num_samples:
        batch, model_kwargs = next(data)
        x = jnp.asarray(batch)
        y = jnp.asarray(model_kwargs["y"]) if args.class_cond else None
        model_fn = make_image_model_fn(model, variables, diffusion, y=y)
        rng, r = jax.random.split(rng)
        out = diffusion.calc_bpd_loop(
            lambda xx, tt: model_fn(xx, tt), x, r,
            clip_denoised=args.clip_denoised,
        )
        for key in all_metrics:
            all_metrics[key].append(np.asarray(out[key]).mean(axis=0))
        all_bpd.extend(np.asarray(out["total_bpd"]).tolist())
        num_complete += len(batch)
        logger.log(f"done {num_complete} samples: bpd={np.mean(all_bpd)}")

    if jax.process_index() == 0:
        for name, terms in all_metrics.items():
            out_path = os.path.join(logger.get_dir(), f"{name}_terms.npz")
            logger.log(f"saving {name} terms to {out_path}")
            np.savez(out_path, np.mean(np.stack(terms), axis=0))
    logger.log("evaluation complete")


def create_argparser():
    defaults = dict(
        data_dir="",
        clip_denoised=True,
        num_samples=1000,
        batch_size=1,
        model_path="",
        seed=0,
        use_bf16=True,
    )
    defaults.update(model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
