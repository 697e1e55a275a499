"""KV metric logger with pluggable sinks (stdout/log/json/csv/tensorboard/
wandb), same public surface as the reference's OpenAI-baselines-lineage logger
(/root/reference/improved_diffusion/logger.py): logkv / logkv_mean / dumpkvs /
log / configure / profile_kv / @profile.

wandb and tensorboard are optional; sinks degrade gracefully when the
packages are absent. Only process 0 writes rich sinks, other processes get a
plain 'log' sink (reference logger.py:502-507).
"""

import datetime
import json
import os
import os.path as osp
import sys
import tempfile
import time
from collections import defaultdict
from contextlib import contextmanager
from functools import wraps

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class KVWriter:
    def writekvs(self, kvs):
        raise NotImplementedError


class SeqWriter:
    def writeseq(self, seq):
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, "wt")
            self.own_file = True
        else:
            assert hasattr(filename_or_file, "read")
            self.file = filename_or_file
            self.own_file = False

    def writekvs(self, kvs):
        key2str = {}
        for key, val in sorted(kvs.items()):
            valstr = f"{val:<8.3g}" if hasattr(val, "__float__") else str(val)
            key2str[self._truncate(key)] = self._truncate(valstr)
        if len(key2str) == 0:
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for key, val in sorted(key2str.items(), key=lambda kv: kv[0].lower()):
            lines.append(
                f"| {key}{' ' * (keywidth - len(key))} | {val}{' ' * (valwidth - len(val))} |"
            )
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    @staticmethod
    def _truncate(s):
        maxlen = 30
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        seq = list(seq)
        for i, elem in enumerate(seq):
            self.file.write(elem)
            if i < len(seq) - 1:
                self.file.write(" ")
        self.file.write("\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "wt")

    def writekvs(self, kvs):
        for k, v in sorted(kvs.items()):
            if hasattr(v, "dtype"):
                kvs[k] = float(v)
        self.file.write(json.dumps(kvs, default=str) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "w+t")
        self.keys = []
        self.sep = ","

    def writekvs(self, kvs):
        extra_keys = list(kvs.keys() - self.keys)
        extra_keys.sort()
        if extra_keys:
            self.keys.extend(extra_keys)
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.write(self.sep.join(self.keys) + "\n")
            for line in lines[1:]:
                self.file.write(line[:-1])
                self.file.write(self.sep * len(extra_keys))
                self.file.write("\n")
        self.file.write(
            self.sep.join("" if kvs.get(k) is None else str(kvs.get(k)) for k in self.keys)
        )
        self.file.write("\n")
        self.file.flush()

    def close(self):
        self.file.close()


class WandbOutputFormat(KVWriter):
    """wandb sink; init'd with project FlexDiff like the reference
    (logger.py:154-192). Degrades to no-op if wandb is unavailable."""

    def __init__(self, args=None, resume_id=None):
        try:
            import wandb
        except ImportError:
            self.wandb = None
            return
        self.wandb = wandb
        kwargs = dict(project=os.environ.get("WANDB_PROJECT", "FlexDiff"))
        if resume_id:
            kwargs.update(id=resume_id, resume="must")
        if args is not None:
            kwargs["config"] = vars(args) if hasattr(args, "__dict__") else args
        if wandb.run is None:
            wandb.init(**kwargs)

    def writekvs(self, kvs):
        if self.wandb is None:
            return
        self.wandb.log({k: v for k, v in kvs.items()})

    def close(self):
        pass


class TensorBoardOutputFormat(KVWriter):
    def __init__(self, dir):
        os.makedirs(dir, exist_ok=True)
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(log_dir=dir)
        except Exception:
            self.writer = None
        self.step = 0

    def writekvs(self, kvs):
        if self.writer is None:
            return
        step = int(kvs.get("step", self.step))
        for k, v in kvs.items():
            if hasattr(v, "__float__"):
                try:
                    self.writer.add_scalar(k, float(v), step)
                except Exception:
                    pass
        self.step = step + 1

    def close(self):
        if self.writer is not None:
            self.writer.close()


def make_output_format(fmt, ev_dir, log_suffix="", args=None, resume_id=None):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    elif fmt == "log":
        return HumanOutputFormat(osp.join(ev_dir, f"log{log_suffix}.txt"))
    elif fmt == "json":
        return JSONOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.json"))
    elif fmt == "csv":
        return CSVOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.csv"))
    elif fmt == "wandb":
        return WandbOutputFormat(args=args, resume_id=resume_id)
    elif fmt == "tensorboard":
        return TensorBoardOutputFormat(osp.join(ev_dir, f"tb{log_suffix}"))
    else:
        raise ValueError(f"Unknown format specified: {fmt}")


# ================================================================ #
# API
# ================================================================ #


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
    return get_current().name2val


def log(*args, level=INFO):
    get_current().log(*args, level=level)


def debug(*args):
    log(*args, level=DEBUG)


def info(*args):
    log(*args, level=INFO)


def warn(*args):
    log(*args, level=WARN)


def error(*args):
    log(*args, level=ERROR)


def set_level(level):
    get_current().set_level(level)


def get_dir():
    return get_current().get_dir()


record_tabular = logkv
dump_tabular = dumpkvs


@contextmanager
def profile_kv(scopename):
    logkey = "wait_" + scopename
    tstart = time.time()
    try:
        yield
    finally:
        get_current().name2val[logkey] += time.time() - tstart


def profile(n):
    """Decorator: profile wall time of a function into 'wait_<n>'."""

    def decorator_with_name(func):
        @wraps(func)
        def func_wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)

        return func_wrapper

    return decorator_with_name


# ================================================================ #
# Backend
# ================================================================ #


def get_current():
    if Logger.CURRENT is None:
        _configure_default_logger()
    return Logger.CURRENT


class Logger:
    DEFAULT = None
    CURRENT = None

    def __init__(self, dir, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        if val is None:
            self.name2val[key] = None
            return
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        if self.level == DISABLED:
            return {}
        d = dict(self.name2val)
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(d)
        self.name2val.clear()
        self.name2cnt.clear()
        return d

    def log(self, *args, level=INFO):
        if self.level <= level:
            self._do_log(args)

    def set_level(self, level):
        self.level = level

    def get_dir(self):
        return self.dir

    def close(self):
        for fmt in self.output_formats:
            fmt.close()

    def _do_log(self, args):
        stamped = (f"[{datetime.datetime.now():%Y-%m-%d %H:%M:%S}]",) + args
        for fmt in self.output_formats:
            if isinstance(fmt, SeqWriter):
                fmt.writeseq(map(str, stamped))


def configure(dir=None, format_strs=None, args=None, resume_id=None):
    """Configure the global logger; defaults match the reference
    (logger.py:479-519): OPENAI_LOGDIR / OPENAI_LOG_FORMAT env overrides,
    rank-0 gets 'stdout,log,csv' (+wandb if available), others 'log'."""
    import jax

    if dir is None:
        dir = os.environ.get("OPENAI_LOGDIR")
    if dir is None:
        dir = osp.join(
            tempfile.gettempdir(),
            datetime.datetime.now().strftime("openai-%Y-%m-%d-%H-%M-%S-%f"),
        )
    assert isinstance(dir, str)
    os.makedirs(dir, exist_ok=True)

    rank = jax.process_index()
    log_suffix = ""
    if format_strs is None:
        if rank == 0:
            format_strs = os.environ.get("OPENAI_LOG_FORMAT", "stdout,log,csv").split(",")
        else:
            format_strs = os.environ.get("OPENAI_LOG_FORMAT_MPI", "log").split(",")
            log_suffix = f"-rank{rank:03d}"
    format_strs = [f for f in format_strs if f]
    output_formats = [
        make_output_format(f, dir, log_suffix, args=args, resume_id=resume_id)
        for f in format_strs
    ]

    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    log(f"Logging to {dir}")


def _configure_default_logger():
    configure(format_strs=["stdout"])
    Logger.DEFAULT = Logger.CURRENT


def reset():
    if Logger.CURRENT is not Logger.DEFAULT:
        Logger.CURRENT.close()
        Logger.CURRENT = Logger.DEFAULT
        log("Reset logger")
