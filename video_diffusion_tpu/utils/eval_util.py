"""Eval-run path conventions and media export
(reference improved_diffusion/test_util.py:31-193). The eval-dir naming is a
contract consumed by every downstream tool — keep it byte-identical:

  results/<ckpt_dir_subpath>/<ckpt_name[_step]>[_ddim][_respaceN]/
    <mode>[_optimal-x]_<max_frames>_<step_size>_<T>_<obs_length>[postfix]/
      samples/sample_<vid:04d>-<seed>.npy   (uint8, T x C x H x W)
"""

import os
from pathlib import Path

import numpy as np
from PIL import Image

from . import checkpoint as ckpt_lib
from .protect import Protect  # noqa: F401  (re-exported for parity)


def load_checkpoint(checkpoint_path, use_ddim=False, timestep_respacing="",
                    use_bf16=True):
    """Rebuild (model, diffusion) from the config stored inside a checkpoint
    (reference test_util.py:31-62)."""
    from argparse import Namespace

    from ..models.factory import (
        create_video_model_and_diffusion,
        video_model_and_diffusion_defaults,
        args_to_dict,
    )

    default_model_configs = {
        "enforce_position_invariance": False,
        "cond_emb_type": "channel",
    }
    data = ckpt_lib.load_checkpoint(checkpoint_path)
    state_dict = data["state_dict"]
    model_args = dict(data["config"])
    model_args.update({"use_ddim": use_ddim, "timestep_respacing": timestep_respacing})
    for k, v in default_model_configs.items():
        model_args.setdefault(k, v)
    model_args = Namespace(**model_args)
    model, diffusion = create_video_model_and_diffusion(
        **args_to_dict(model_args, video_model_and_diffusion_defaults().keys()),
        use_bf16=use_bf16,
    )
    return (model, {"params": state_dict}, diffusion), model_args, data["step"]


def get_model_results_path(args, postfix=""):
    """results/<ckpt_subpath>/<name[_step]>[postfix] (test_util.py:65-106)."""
    if getattr(args, "use_ddim", False):
        postfix += "_ddim"
    if getattr(args, "timestep_respacing", "") != "":
        postfix += "_" + f"respace{args.timestep_respacing}"
    if getattr(args, "eval_dir", None):
        return Path(args.eval_dir)
    checkpoint_path = Path(args.checkpoint_path)
    name = checkpoint_path.stem
    if name.endswith("latest"):
        step = ckpt_lib.load_checkpoint(args.checkpoint_path)["step"]
        name += f"_{step}"
    if postfix != "":
        name += postfix
    path = None
    for idx, x in enumerate(checkpoint_path.parts):
        if "checkpoint" in x:
            path = Path(*checkpoint_path.parts[idx + 1:])
            break
    assert path is not None, (
        f"checkpoint path {checkpoint_path} has no 'checkpoint' component"
    )
    return Path("results") / path.parent / name


def get_eval_run_identifier(args, postfix=""):
    """<mode>[_optimal-x]_<max_frames>_<step_size>_<T>_<obs_length>
    (test_util.py:109-132)."""
    res = args.inference_mode
    if getattr(args, "optimality", None) is not None:
        res += f"_optimal-{args.optimality}"
    res += f"_{args.max_frames}_{args.step_size}_{args.T}_{args.obs_length}"
    if getattr(args, "dataset_partition", None) == "train":
        res = "trainset_" + res
    if getattr(args, "use_gradient_method", False):
        res = "gradientmethod_" + res
    if getattr(args, "override_dataset", None) is not None:
        res = f"{args.override_dataset}_" + res
    if postfix != "":
        res += postfix
    return res


# ------------------------------------------------------------------ #
# media export (test_util.py:138-193)
# ------------------------------------------------------------------ #


def mark_as_observed(images, color=(255, 0, 0)):
    """Draw a colored border on observed frames; images (..., C, H, W)."""
    for i, c in enumerate(color):
        images[..., i, :, 1:2] = c
        images[..., i, 1:2, :] = c
        images[..., i, :, -2:-1] = c
        images[..., i, -2:-1, :] = c


def tensor2pil(arr, drange=(0, 1)):
    """(B x)3xHxW array -> PIL image(s)."""
    arr = np.asarray(arr)
    if arr.ndim == 3:
        return tensor2pil(arr[None], drange=drange)[0]
    imgs = arr.transpose([0, 2, 3, 1])
    imgs = (imgs - drange[0]) / (drange[1] - drange[0]) * 255
    imgs = imgs.astype(np.uint8)
    return [Image.fromarray(img) for img in imgs]


def tensor2gif(arr, path, drange=(0, 1), random_str=""):
    import imageio

    frames = [np.asarray(f) for f in tensor2pil(arr, drange=drange)]
    imageio.mimsave(path, frames)


def tensor2mp4(arr, path, drange=(0, 1), random_str=""):
    gif_path = f"/tmp/tmp_{random_str or os.getpid()}.gif"
    tensor2gif(arr, path=gif_path, drange=drange, random_str=random_str)
    os.system(
        f"ffmpeg -y -hide_banner -loglevel error -i {gif_path} -r 10 "
        f'-movflags faststart -pix_fmt yuv420p -vf '
        f'"scale=trunc(iw/2)*2:trunc(ih/2)*2" {path}'
    )


def tensor2avi(arr, path, drange=(0, 1), random_str=""):
    import cv2

    frames = tensor2pil(arr, drange=drange)
    video = cv2.VideoWriter(str(path), 0, 10, frames[0].size)
    for frame in frames:
        video.write(np.asarray(frame)[..., ::-1])
    video.release()
