"""Train a frame-set-conditional video diffusion model.

CLI parity with /root/reference/scripts/video_train.py: same flags, same
dataset-derived defaults (T, image_size, RPE buckets default to T), same
checkpoint layout. TPU-native internals: jitted SPMD train step over a
('data','model') mesh, host-side mask sampling in the input pipeline.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import video_diffusion_tpu.utils  # noqa: F401  (jax compilation cache)
from video_diffusion_tpu.data import (
    default_image_size_dict,
    default_iterations_dict,
    default_T_dict,
    load_video_data,
)
from video_diffusion_tpu.models.factory import (
    create_video_model_and_diffusion,
    video_model_and_diffusion_defaults,
)
from video_diffusion_tpu.parallel import setup_distributed
from video_diffusion_tpu.training.resample import create_named_schedule_sampler
from video_diffusion_tpu.training.train_loop import TrainLoop
from video_diffusion_tpu.utils import logger
from video_diffusion_tpu.utils.script_util import (
    add_dict_to_argparser,
    args_to_dict,
    set_random_seed,
)


def main():
    args = create_argparser().parse_args()
    set_random_seed(args.seed)
    setup_distributed()

    # dataset-derived defaults (reference video_train.py:62-76)
    if args.T == -1:
        args.T = default_T_dict[args.dataset]
    if args.image_size == -1:
        args.image_size = default_image_size_dict[args.dataset]
    if args.rp_alpha is None or args.rp_alpha == "None":
        args.rp_alpha = args.T
    if args.rp_beta is None or args.rp_beta == "None":
        args.rp_beta = args.T
    if args.rp_gamma is None or args.rp_gamma == "None":
        args.rp_gamma = args.T
    args.rp_alpha, args.rp_beta, args.rp_gamma = (
        int(args.rp_alpha), int(args.rp_beta), int(args.rp_gamma),
    )

    logger.configure(args=args, resume_id=args.resume_id or None)
    logger.log("creating model and diffusion...")
    model, diffusion = create_video_model_and_diffusion(
        **args_to_dict(args, video_model_and_diffusion_defaults().keys()),
        use_bf16=args.use_bf16,
    )
    schedule_sampler = create_named_schedule_sampler(args.schedule_sampler, diffusion)

    logger.log("creating data loader...")
    data = load_video_data(
        dataset_name=args.dataset,
        batch_size=args.batch_size,
        T=args.T,
        image_size=args.image_size,
        num_workers=args.num_workers,
        seed=args.seed,
    )

    iterations = (
        default_iterations_dict[args.dataset]
        if args.iterations in (None, -1)
        else args.iterations
    )

    logger.log("training...")
    loop = TrainLoop(
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
        T=args.T,
        schedule_sampler=schedule_sampler,
        weight_decay=args.weight_decay,
        lr_anneal_steps=args.lr_anneal_steps,
        sample_interval=args.sample_interval,
        iterations=iterations,
        do_inefficient_marg=args.do_inefficient_marg,
        n_valid_batches=args.n_valid_batches,
        n_valid_repeats=args.n_valid_repeats,
        max_frames=args.max_frames,
        n_interesting_masks=args.n_interesting_masks,
        mask_distribution=args.mask_distribution,
        pad_with_random_frames=args.pad_with_random_frames,
        observed_frames=args.observed_frames,
        use_gradient_method=args.use_gradient_method,
        args=args,
        seed=args.seed,
    )
    if args.just_visualise:
        loop.visualise()
    elif args.just_save_masks:
        loop.save_masks(n_masks=100)
    else:
        loop.run_loop()


def create_argparser():
    defaults = dict(
        dataset="mazes_cwvae",
        seed=0,
        schedule_sampler="uniform",
        lr=1e-4,
        weight_decay=0.0,
        lr_anneal_steps=0,
        iterations=-1,
        batch_size=1,
        microbatch=-1,
        ema_rate="0.9999",
        log_interval=10,
        sample_interval=50000,
        save_interval=50000,
        resume_checkpoint="",
        resume_id="",
        use_fp16=False,
        use_bf16=True,
        fp16_scale_growth=1e-3,
        num_workers=-1,
        max_frames=10,
        n_valid_batches=1,
        n_valid_repeats=2,
        valid_microbatch=-1,
        n_interesting_masks=3,
        mask_distribution="differently-spaced-groups",
        pad_with_random_frames=True,
        observed_frames="x_t_minus_1",
        use_gradient_method=False,
        do_inefficient_marg=False,
        save_latest_only=True,
        just_visualise=False,
        just_save_masks=False,
    )
    defaults.update(video_model_and_diffusion_defaults())
    parser = argparse.ArgumentParser()
    add_dict_to_argparser(parser, defaults)
    return parser


if __name__ == "__main__":
    main()
