"""Train a super-resolution diffusion model on (large, area-downsampled small)
pairs (reference scripts/super_res_train.py:60-75)."""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import video_diffusion_tpu.utils  # noqa: F401
from video_diffusion_tpu.data import load_data
from video_diffusion_tpu.models.factory import (
    sr_create_model_and_diffusion,
    sr_model_and_diffusion_defaults,
)
from video_diffusion_tpu.parallel import setup_distributed
from video_diffusion_tpu.training.image_loop import ImageTrainLoop
from video_diffusion_tpu.training.resample import create_named_schedule_sampler
from video_diffusion_tpu.utils import logger
from video_diffusion_tpu.utils.script_util import add_dict_to_argparser, args_to_dict


def _area_downsample(batch, small_size):
    """(B, H, W, C) -> (B, small, small, C) by box averaging — the 'area'
    downsampling the reference uses for the low-res conditioning."""
    B, H, W, C = batch.shape
    f = H // small_size
    return batch.reshape(B, small_size, f, small_size, f, C).mean(axis=(2, 4))


def load_superres_data(data_dir, batch_size, large_size, small_size,
                       class_cond=False):
    data = load_data(
        data_dir=data_dir,
        batch_size=batch_size,
        image_size=large_size,
        class_cond=class_cond,
    )
    for large_batch, model_kwargs in data:
        model_kwargs["low_res"] = _area_downsample(
            np.asarray(large_batch), small_size
        )
        yield large_batch, model_kwargs


def main():
    args = create_argparser().parse_args()
    setup_distributed()
    logger.configure()

    logger.log("creating model...")
    model, diffusion = sr_create_model_and_diffusion(
        **args_to_dict(args, sr_model_and_diffusion_defaults().keys()),
        use_bf16=args.use_bf16,
    )
    schedule_sampler = create_named_schedule_sampler(args.schedule_sampler, diffusion)

    logger.log("creating data loader...")
    data = load_superres_data(
        args.data_dir,
        args.batch_size,
        large_size=args.large_size,
        small_size=args.small_size,
        class_cond=args.class_cond,
    )

    logger.log("training...")
    ImageTrainLoop(
        model=model,
        diffusion=diffusion,
        data=data,
        batch_size=args.batch_size,
        microbatch=args.microbatch,
        lr=args.lr,
        ema_rate=args.ema_rate,
        log_interval=args.log_interval,
        save_interval=args.save_interval,
        resume_checkpoint=args.resume_checkpoint,
        schedule_sampler=schedule_sampler,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        iterations=args.iterations,
        args=args,
        is_super_res=True,
    ).run_loop()


def create_argparser():
    defaults = dict(
        data_dir="",
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        iterations=500000,
        batch_size=1,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=10,
        save_interval=10000,
        resume_checkpoint="",
        resume_id="",
        use_fp16=False,
        use_bf16=True,
        fp16_scale_growth=1e-3,
        class_cond=False,
        save_latest_only=False,
    )
    defaults.update(sr_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
