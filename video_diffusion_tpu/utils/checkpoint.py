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

TPU-native alternative (``VDT_CKPT_BACKEND=orbax``): one orbax composite
directory per save point, ``ckpt_<p>.orbax/`` with items
``model`` / ``ema_<rate>`` / ``opt`` / ``meta``. Unlike the pickle path
(rank-0 ``jax.device_get`` of the whole tree, like the reference's rank-0
``torch.save``), the orbax path saves the *live sharded device arrays*:
every process participates, each host writes only its own shards, and the
write is asynchronous — the train step resumes while the commit (atomic
tmp-dir rename) finishes in the background. All readers
(``find_resume_checkpoint`` / ``load_checkpoint`` / ``find_ema_checkpoint``
/ ``load_opt_state``) understand both layouts; EMA items inside a composite
are addressed as ``<dir>#ema_<rate>``.
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
    """Load a model/ema checkpoint dict {'state_dict', 'config', 'step'}.

    Accepts a pickle ``.pt`` file, an orbax composite dir (returns the
    ``model`` item), or ``<dir>#<item>`` selecting an item (EMA) inside a
    composite.
    """
    path = str(path)
    if ".orbax" in path:
        base, _, item = path.partition("#")
        return _load_orbax(base, item or "model")
    with open(path, "rb") as f:
        return pickle.load(f)


def load_opt_state(path, target=None):
    """Load an optimizer-state pytree. For the orbax layout, ``path`` is the
    composite dir and ``target`` (the freshly initialized, possibly sharded
    opt state) restores structure/dtype/sharding in place of the pickle
    path's tree_map cast."""
    path = str(path)
    if ".orbax" in path:
        import orbax.checkpoint as ocp

        ck = _orbax_checkpointer()
        ck.wait_until_finished()
        restore = (
            ocp.args.StandardRestore(target)
            if target is not None
            else ocp.args.StandardRestore()
        )
        return ck.restore(path.partition("#")[0],
                          args=ocp.args.Composite(opt=restore))["opt"]
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------- #
# orbax backend (VDT_CKPT_BACKEND=orbax)
# ---------------------------------------------------------------------- #
_ORBAX_CKPTR = None


def checkpoint_backend():
    """'pickle' (default; reference layout) or 'orbax' (sharded + async)."""
    return os.environ.get("VDT_CKPT_BACKEND", "pickle")


def _orbax_checkpointer():
    global _ORBAX_CKPTR
    if _ORBAX_CKPTR is None:
        import orbax.checkpoint as ocp

        _ORBAX_CKPTR = ocp.AsyncCheckpointer(ocp.CompositeCheckpointHandler())
    return _ORBAX_CKPTR


def wait_for_checkpoints():
    """Block until any in-flight async orbax save has committed. Call before
    process exit (and before reading back a just-saved checkpoint)."""
    if _ORBAX_CKPTR is not None:
        _ORBAX_CKPTR.wait_until_finished()


def _ema_item(rate):
    """'0.9999' -> 'ema_0.9999' (orbax item names tolerate dots; keep the
    same spelling as the pickle filenames for greppability)."""
    return f"ema_{rate}"


def _jsonable_config(config):
    out = {}
    for k, v in dict(config).items():
        if isinstance(v, tuple):
            v = list(v)
        if isinstance(v, (str, int, float, bool, type(None), list, dict)):
            out[k] = v
        else:
            out[k] = str(v)
    return out


def save_checkpoint_orbax(logdir, *, params, ema_params, ema_rates, opt_state,
                          config, step, save_latest_only=False):
    """Async sharded save of one save point as ckpt_<p>.orbax/.

    Pass the LIVE (device, possibly sharded) pytrees — no ``device_get``.
    Every process must call this (orbax coordinates the per-host shard
    writes); it returns as soon as device buffers are snapshotted, and the
    atomic commit completes in the background.
    """
    import orbax.checkpoint as ocp

    logdir = Path(logdir).absolute()
    if jax.process_index() == 0:
        logdir.mkdir(parents=True, exist_ok=True)
    postfix = "latest" if save_latest_only else f"{step:06d}"
    ck = _orbax_checkpointer()
    ck.wait_until_finished()  # one in-flight save at a time
    items = {
        "model": ocp.args.StandardSave(params),
        "opt": ocp.args.StandardSave(opt_state),
        "meta": ocp.args.JsonSave(
            {"config": _jsonable_config(config), "step": int(step)}
        ),
    }
    for rate, p in zip(ema_rates, ema_params):
        items[_ema_item(rate)] = ocp.args.StandardSave(p)
    ck.save(
        str(logdir / f"ckpt_{postfix}.orbax"),
        args=ocp.args.Composite(**items),
        force=True,  # overwrite 'latest' in place (atomic rename)
    )


def _load_orbax(base, item):
    import orbax.checkpoint as ocp

    ck = _orbax_checkpointer()
    ck.wait_until_finished()
    out = ck.restore(
        base,
        args=ocp.args.Composite(
            **{item: ocp.args.StandardRestore(), "meta": ocp.args.JsonRestore()}
        ),
    )
    return {
        "state_dict": out[item],
        "config": out["meta"]["config"],
        "step": out["meta"]["step"],
    }


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
    """Latest checkpoint in checkpoints/<run_id>/: 'model_latest.pt' (or
    'ckpt_latest.orbax') if present else the highest-step 'model_*.pt' /
    'ckpt_*.orbax' (reference train_util.py:920-942)."""
    if not run_id:
        return None
    logdir = get_blob_logdir(run_id, root_dir)
    if not os.path.exists(logdir):
        return None
    for latest in ("model_latest.pt", "ckpt_latest.orbax"):
        path = os.path.join(logdir, latest)
        if os.path.exists(path):
            return path
    best_step, best_path = -1, None
    for pattern in ("model_*.pt", "ckpt_*.orbax"):
        for d in glob.glob(os.path.join(logdir, pattern)):
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
    if str(main_checkpoint).endswith(".orbax"):
        item = _ema_item(rate)
        if os.path.isdir(os.path.join(main_checkpoint, item)):
            return f"{main_checkpoint}#{item}"
        return None
    filename = (
        f"ema_{rate}_latest.pt" if save_latest_only else f"ema_{rate}_{step:06d}.pt"
    )
    path = os.path.join(os.path.dirname(main_checkpoint), filename)
    return path if os.path.exists(path) else None
