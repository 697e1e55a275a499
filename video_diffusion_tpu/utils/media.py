"""Video/image media logging (reference train_util.py:819-895): unnormalize,
gather across hosts, and log as image grids / videos — to wandb when the sink
is live, and always to PNG/GIF files under the logger dir so headless runs
keep the artifacts."""

import os

import numpy as np

from . import logger


def _unnormalize(array):
    return np.clip((np.asarray(array) + 1) * 127.5, 0, 255).astype(np.uint8)


def mark_as_observed(images, color=(1.0, -1.0, -1.0)):
    """Draw a border on observed frames in-place; images (..., H, W, C) in
    [-1, 1] (reference train_util._mark_as_observed:819-824)."""
    for i, c in enumerate(color):
        images[..., :, 1:2, i] = c
        images[..., 1:2, :, i] = c
        images[..., :, -2:-1, i] = c
        images[..., -2:-1, :, i] = c


def concat_images_with_padding(images, horizontal=True, pad_dim=1, pad_val=0,
                               pad_ends=False):
    """Concatenate (N, H, W, C) frames with padding strips
    (reference train_util.py:827-843)."""
    images = list(images)
    h, w, c = images[0].shape
    pad_h, pad_w = (h, pad_dim) if horizontal else (pad_dim, w)
    padding = np.full((pad_h, pad_w, c), pad_val, dtype=images[0].dtype)
    out = []
    for img in images:
        out.extend([img, padding])
    if pad_ends:
        out = [padding, *out, padding]
    out = out[:-1] if not pad_ends else out[:-1]
    return np.concatenate(out, axis=1 if horizontal else 0)


def gather_and_log_videos(name, array, log_as="both", pad_dim_h=1, pad_dim_v=1,
                          pad_val=255, pad_ends=False):
    """Unnormalize and log (B, T, H, W, C) videos in [-1, 1]; gathers across
    processes first (reference train_util.py:846-895, dist.all_gather ->
    multihost process_allgather)."""
    import jax

    array = _unnormalize(array)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        array = np.asarray(multihost_utils.process_allgather(array)).reshape(
            (-1,) + array.shape[1:]
        )
    if jax.process_index() != 0:
        return

    out_dir = os.path.join(logger.get_dir() or ".", "media")
    os.makedirs(out_dir, exist_ok=True)
    safe = name.strip("/").replace("/", "_")

    wandb = None
    try:
        import wandb as _wandb

        wandb = _wandb if _wandb.run is not None else None
    except ImportError:
        pass

    if log_as in ("array", "both"):
        rows = [
            concat_images_with_padding(
                vid, horizontal=True, pad_dim=pad_dim_h, pad_val=pad_val,
                pad_ends=pad_ends,
            )
            for vid in array
        ]
        grid = concat_images_with_padding(
            rows, horizontal=False, pad_dim=pad_dim_v, pad_val=pad_val,
            pad_ends=pad_ends,
        )
        from PIL import Image

        Image.fromarray(grid).save(os.path.join(out_dir, f"{safe}_array.png"))
        if wandb:
            logger.logkv(name + "array", wandb.Image(grid))
    if log_as in ("video", "both"):
        # checkerboard end-marker frame (train_util.py:890-892)
        final = np.zeros_like(array[0, :1])
        final[..., ::2, 1::2, :] = 255
        for i, video in enumerate(array):
            vid = np.concatenate([video, final], axis=0)
            try:
                import imageio

                imageio.mimsave(
                    os.path.join(out_dir, f"{safe}_video-{i}.gif"), list(vid)
                )
            except ImportError:
                pass
            if wandb:
                logger.logkv(
                    name + f"video-{i}",
                    wandb.Video(np.moveaxis(vid, -1, 1)),
                )


def log_attention_heatmaps(attns, frame_indices):
    """Log temporal/spatial attention matrices captured from the model
    (reference train_util.py:727-754): temporal matrices as matplotlib
    figures with frame-index tick labels, spatial as image grids."""
    import jax

    if jax.process_index() != 0:
        return
    out_dir = os.path.join(logger.get_dir() or ".", "media")
    os.makedirs(out_dir, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return
    for key, mat in attns.items():
        mat = np.asarray(mat)  # (B, T, T)
        B = mat.shape[0]
        fig, axes = plt.subplots(B, 1, figsize=(5, 4.5 * B), squeeze=False)
        for b in range(B):
            ax = axes[b][0]
            ax.imshow(mat[b], vmin=0, cmap="binary_r")
            n = mat.shape[-1]
            fi = np.asarray(frame_indices)[min(b, len(frame_indices) - 1)][:n]
            ax.set_xticks(np.arange(n))
            ax.set_xticklabels(fi)
            ax.set_yticks(np.arange(n))
            ax.set_yticklabels(fi)
        safe = key.strip("/").replace("/", "_")
        fig.savefig(os.path.join(out_dir, f"{safe}.png"), bbox_inches="tight")
        plt.close(fig)
