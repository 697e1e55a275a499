"""Key/value metric logging with fan-out sinks.

Public surface kept name-compatible with the reference CLI contract
(/root/reference/improved_diffusion/logger.py): ``logkv``/``logkv_mean``/
``dumpkvs``/``log``/``configure``/``profile_kv``/``@profile``, the
``OPENAI_LOGDIR``/``OPENAI_LOG_FORMAT`` env knobs, and the on-disk file names
(``log.txt``, ``progress.csv``, ``progress.json``).  The implementation is
this framework's own: a metric buffer object plus small sink classes, with
wandb/tensorboard strictly optional (tensorboard events go through
``tf.summary`` — no torch dependency anywhere).
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import tempfile
import time
from contextlib import contextmanager
from functools import wraps

DEBUG, INFO, WARN, ERROR, DISABLED = 10, 20, 30, 40, 50

_STAMP = "%Y-%m-%d %H:%M:%S"


def _scalar(v):
    """Best-effort float coercion (jnp/np scalars, python numbers)."""
    try:
        return float(v)
    except (TypeError, ValueError):
        return None


# --------------------------------------------------------------------- #
# sinks
# --------------------------------------------------------------------- #


class Sink:
    """A metric sink. ``row`` receives one flushed kv dict per dump;
    ``line`` receives free-form log text. Either may be a no-op."""

    def row(self, kvs: dict):
        pass

    def line(self, text: str):
        pass

    def close(self):
        pass


class TableSink(Sink):
    """Human-readable sink: aligned two-column table per dump + log lines.
    Writes to an open stream or owns a file it opened by path."""

    WIDTH = 40

    def __init__(self, target):
        self._owns = isinstance(target, str)
        self.stream = open(target, "at") if self._owns else target

    def _clip(self, s):
        return s if len(s) <= self.WIDTH else s[: self.WIDTH - 3] + "..."

    def row(self, kvs):
        if not kvs:
            return
        cells = []
        for k in sorted(kvs, key=str.lower):
            v = kvs[k]
            shown = f"{v:<10.4g}" if _scalar(v) is not None else str(v)
            cells.append((self._clip(str(k)), self._clip(shown)))
        kw = max(len(k) for k, _ in cells)
        vw = max(len(v) for _, v in cells)
        rule = "-" * (kw + vw + 7)
        out = [rule]
        out += [f"| {k:<{kw}} | {v:<{vw}} |" for k, v in cells]
        out.append(rule)
        self.stream.write("\n".join(out) + "\n")
        self.stream.flush()

    def line(self, text):
        self.stream.write(text + "\n")
        self.stream.flush()

    def close(self):
        if self._owns:
            self.stream.close()


class JsonlSink(Sink):
    """One JSON object per dump (progress.json)."""

    def __init__(self, path):
        self.stream = open(path, "at")

    def row(self, kvs):
        enc = {k: (_scalar(v) if _scalar(v) is not None else str(v))
               for k, v in kvs.items()}
        self.stream.write(json.dumps(enc) + "\n")
        self.stream.flush()

    def close(self):
        self.stream.close()


class CsvSink(Sink):
    """progress.csv with a growing column set: when a dump introduces new
    keys the existing file is re-read and rewritten with the widened header.
    No in-memory row mirror — a key first logged days into a run widens the
    file in one O(file) pass instead of keeping every row cached forever."""

    def __init__(self, path):
        self.path = path
        self.columns: list[str] = []

    def row(self, kvs):
        import csv

        new = sorted(k for k in kvs if k not in self.columns)
        if new:
            old_columns = list(self.columns)
            self.columns.extend(new)
            rows = []
            if old_columns and os.path.exists(self.path):
                # csv.reader honours the quoting csv.writer emitted, so
                # values containing commas (tuples, messages) survive the
                # widen-rewrite intact.
                with open(self.path, newline="") as f:
                    reader = csv.reader(f)
                    next(reader, None)  # header
                    for vals in reader:
                        rows.append(dict(zip(old_columns, vals)))
            with open(self.path, "wt", newline="") as f:
                w = csv.writer(f)
                w.writerow(self.columns)
                for r in rows:
                    w.writerow(self._vals(r))
                w.writerow(self._vals(kvs))
        else:
            with open(self.path, "at", newline="") as f:
                csv.writer(f).writerow(self._vals(kvs))

    def _vals(self, r):
        return ["" if r.get(c) is None else str(r.get(c, ""))
                for c in self.columns]


class WandbSink(Sink):
    """Optional wandb sink (project FlexDiff, same as the reference's wandb
    contract); silently inert when wandb is not importable."""

    def __init__(self, args=None, resume_id=None):
        try:
            import wandb
        except ImportError:
            self._w = None
            return
        self._w = wandb
        if wandb.run is None:
            init = {"project": os.environ.get("WANDB_PROJECT", "FlexDiff")}
            if resume_id:
                init.update(id=resume_id, resume="must")
            if args is not None:
                init["config"] = vars(args) if hasattr(args, "__dict__") else args
            wandb.init(**init)

    def row(self, kvs):
        if self._w is not None:
            self._w.log(dict(kvs))


class TensorBoardSink(Sink):
    """TB events via tf.summary (lazy TF import; no torch)."""

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        try:
            import tensorflow as tf  # heavyweight; only when requested

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tf = self._writer = None
        self._step = 0

    def row(self, kvs):
        if self._writer is None:
            return
        step = kvs.get("step")
        step = int(step) if _scalar(step) is not None else self._step
        with self._writer.as_default():
            for k, v in kvs.items():
                f = _scalar(v)
                if f is not None:
                    self._tf.summary.scalar(k, f, step=step)
        self._writer.flush()
        self._step = step + 1

    def close(self):
        if self._writer is not None:
            self._writer.close()


_SINK_FACTORIES = {
    "stdout": lambda d, sfx, **kw: TableSink(sys.stdout),
    "log": lambda d, sfx, **kw: TableSink(os.path.join(d, f"log{sfx}.txt")),
    "json": lambda d, sfx, **kw: JsonlSink(os.path.join(d, f"progress{sfx}.json")),
    "csv": lambda d, sfx, **kw: CsvSink(os.path.join(d, f"progress{sfx}.csv")),
    "wandb": lambda d, sfx, **kw: WandbSink(**kw),
    "tensorboard": lambda d, sfx, **kw: TensorBoardSink(os.path.join(d, f"tb{sfx}")),
}


def make_output_format(fmt, ev_dir, log_suffix="", args=None, resume_id=None):
    if fmt not in _SINK_FACTORIES:
        raise ValueError(f"Unknown format specified: {fmt}")
    os.makedirs(ev_dir, exist_ok=True)
    return _SINK_FACTORIES[fmt](ev_dir, log_suffix, args=args, resume_id=resume_id)


# --------------------------------------------------------------------- #
# the logger object
# --------------------------------------------------------------------- #


class Logger:
    DEFAULT = None
    CURRENT = None

    def __init__(self, dir, sinks):
        self.dir = dir
        self.sinks = sinks
        self.level = INFO
        self._vals: dict = {}
        self._counts: dict = {}

    # buffer ----------------------------------------------------------- #
    def logkv(self, key, val):
        self._vals[key] = val
        self._counts.pop(key, None)

    def logkv_mean(self, key, val):
        if val is None:
            self._vals[key] = None
            self._counts.pop(key, None)
            return
        n = self._counts.get(key, 0)
        prev = self._vals.get(key, 0.0) if n else 0.0
        self._vals[key] = (prev * n + val) / (n + 1)
        self._counts[key] = n + 1

    @property
    def name2val(self):  # back-compat accessor (profile_kv accumulates here)
        return self._vals

    def dumpkvs(self):
        if self.level == DISABLED:
            return {}
        snapshot = dict(self._vals)
        for s in self.sinks:
            s.row(snapshot)
        self._vals.clear()
        self._counts.clear()
        return snapshot

    # text ------------------------------------------------------------- #
    def log(self, *parts, level=INFO):
        if self.level > level:
            return
        stamp = datetime.datetime.now().strftime(_STAMP)
        text = " ".join(str(p) for p in ([f"[{stamp}]"] + list(parts)))
        for s in self.sinks:
            s.line(text)

    def close(self):
        for s in self.sinks:
            s.close()


# --------------------------------------------------------------------- #
# module-level API
# --------------------------------------------------------------------- #


def get_current():
    if Logger.CURRENT is None:
        _configure_default_logger()
    return Logger.CURRENT


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def logkvs(d):
    for k, v in d.items():
        logkv(k, v)


def dumpkvs():
    return get_current().dumpkvs()


def getkvs():
    return get_current()._vals


def log(*args, level=INFO):
    get_current().log(*args, level=level)


def _at_level(lvl):
    def write(*args):
        log(*args, level=lvl)

    return write


debug, info, warn, error = map(_at_level, (DEBUG, INFO, WARN, ERROR))


def set_level(level):
    get_current().level = level


def get_dir():
    return get_current().dir


record_tabular = logkv
dump_tabular = dumpkvs


@contextmanager
def profile_kv(scopename):
    key = "wait_" + scopename
    t0 = time.time()
    try:
        yield
    finally:
        vals = get_current()._vals
        vals[key] = vals.get(key, 0.0) + time.time() - t0


def profile(n):
    """Decorator: accumulate a function's wall time into ``wait_<n>``."""

    def wrap(fn):
        @wraps(fn)
        def inner(*a, **kw):
            with profile_kv(n):
                return fn(*a, **kw)

        return inner

    return wrap


def configure(dir=None, format_strs=None, args=None, resume_id=None):
    """Install the global logger. Contract (matching the reference CLIs):
    ``OPENAI_LOGDIR`` overrides the directory, ``OPENAI_LOG_FORMAT`` the sink
    list; process 0 defaults to ``stdout,log,csv``, other processes to a
    rank-suffixed ``log`` sink."""
    import jax

    if dir is None:
        dir = os.environ.get("OPENAI_LOGDIR")
    if dir is None:
        stamp = datetime.datetime.now().strftime("openai-%Y-%m-%d-%H-%M-%S-%f")
        dir = os.path.join(tempfile.gettempdir(), stamp)
    os.makedirs(dir, exist_ok=True)

    rank = jax.process_index()
    suffix = "" if rank == 0 else f"-rank{rank:03d}"
    if format_strs is None:
        env = "OPENAI_LOG_FORMAT" if rank == 0 else "OPENAI_LOG_FORMAT_MPI"
        default = "stdout,log,csv" if rank == 0 else "log"
        format_strs = os.environ.get(env, default).split(",")
    sinks = [
        make_output_format(f, dir, suffix, args=args, resume_id=resume_id)
        for f in format_strs
        if f
    ]
    Logger.CURRENT = Logger(dir=dir, sinks=sinks)
    log(f"Logging to {dir}")


def _configure_default_logger():
    configure(format_strs=["stdout"])
    Logger.DEFAULT = Logger.CURRENT


def reset():
    if Logger.CURRENT is not Logger.DEFAULT:
        Logger.CURRENT.close()
        Logger.CURRENT = Logger.DEFAULT
        log("Reset logger")
