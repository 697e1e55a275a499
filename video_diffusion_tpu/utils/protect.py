"""FileLock wrapper for racy shared files (reference test_util.py:18-28)."""

from pathlib import Path

from filelock import FileLock


class Protect(FileLock):
    """Lock file inferred from the protected path; used around metric pickles,
    model_config.json writes, dataset cache copies, and optimal-schedule
    updates."""

    def __init__(self, path, timeout=30, **kwargs):
        path = Path(path)
        lock_path = Path(path).parent / f"{path.name}.lock"
        lock_path.parent.mkdir(parents=True, exist_ok=True)
        super().__init__(str(lock_path), timeout=timeout, **kwargs)
