"""Checkpoint I/O with the reference's on-disk layout.

Files per save (reference train_util.py:554-589):
  checkpoints/<run_id>/model_<p>.pt       {'state_dict', 'config', 'step'}
  checkpoints/<run_id>/ema_<rate>_<p>.pt  same structure, EMA params
  checkpoints/<run_id>/opt_<p>.pt         optimizer state
where <p> is 'latest' or a zero-padded step. Config travels inside the
checkpoint; downstream tools rebuild the exact model from it.

Contents are pickled numpy pytrees (not torch tensors); the '.pt' suffix is
kept purely for CLI/layout parity. Saves are atomic via the same
copy-to-backup / delete-backup dance as the reference when overwriting
'latest' files (train_util.py:576-587).
"""

import glob
import os
import pickle
import shutil
from pathlib import Path

import jax
import numpy as np


def tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def _atomic_pickle(path, obj, backup=False):
    path = str(path)
    if backup and os.path.exists(path):
        shutil.copy(path, path + "-backup")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(obj, f, protocol=pickle.HIGHEST_PROTOCOL)
    os.replace(tmp, path)
    if os.path.exists(path + "-backup"):
        os.remove(path + "-backup")


def save_checkpoint(logdir, *, params, ema_params, ema_rates, opt_state, config,
                    step, save_latest_only=False):
    """Write model/ema/opt files for one save point. Only call on process 0."""
    logdir = Path(logdir)
    logdir.mkdir(parents=True, exist_ok=True)
    postfix = "latest" if save_latest_only else f"{step:06d}"
    _atomic_pickle(
        logdir / f"opt_{postfix}.pt",
        tree_to_numpy(opt_state),
        backup=save_latest_only,
    )
    for rate, p in zip([0, *ema_rates], [params, *ema_params]):
        filename = f"ema_{rate}_{postfix}.pt" if rate else f"model_{postfix}.pt"
        _atomic_pickle(
            logdir / filename,
            {
                "state_dict": tree_to_numpy(p),
                "config": dict(config),
                "step": step,
            },
            backup=save_latest_only,
        )


def load_checkpoint(path):
    """Load a model/ema checkpoint dict {'state_dict', 'config', 'step'}."""
    with open(path, "rb") as f:
        return pickle.load(f)


def load_opt_state(path):
    with open(path, "rb") as f:
        return pickle.load(f)


def get_blob_logdir(run_id, root_dir=None):
    """checkpoints/<run_id>/ (reference train_util.py:911-917)."""
    root_dir = root_dir or os.environ.get("DIFFUSION_BLOB_LOGDIR", "checkpoints")
    return os.path.join(root_dir, run_id)


def parse_resume_step_from_filename(filename):
    split = filename.split("model")
    if len(split) < 2:
        return 0
    split1 = split[-1].split(".")[0].strip("_")
    try:
        return int(split1)
    except ValueError:
        return 0


def find_resume_checkpoint(run_id, root_dir=None):
    """Latest checkpoint in checkpoints/<run_id>/: 'model_latest.pt' if present
    else the highest-step 'model_*.pt' (reference train_util.py:920-942)."""
    if not run_id:
        return None
    logdir = get_blob_logdir(run_id, root_dir)
    if not os.path.exists(logdir):
        return None
    latest = os.path.join(logdir, "model_latest.pt")
    if os.path.exists(latest):
        return latest
    best_step, best_path = -1, None
    for d in glob.glob(os.path.join(logdir, "model_*.pt")):
        try:
            step = int(os.path.splitext(d)[0].split("_")[-1])
        except ValueError:
            continue
        if step > best_step:
            best_step, best_path = step, d
    return best_path


def find_ema_checkpoint(main_checkpoint, step, rate, save_latest_only=False):
    if main_checkpoint is None:
        return None
    filename = (
        f"ema_{rate}_latest.pt" if save_latest_only else f"ema_{rate}_{step:06d}.pt"
    )
    path = os.path.join(os.path.dirname(main_checkpoint), filename)
    return path if os.path.exists(path) else None
