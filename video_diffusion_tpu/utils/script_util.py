"""argparse-from-defaults-dict config system (reference script_util.py:439-487)."""

import argparse
import random

import numpy as np


def add_dict_to_argparser(parser, default_dict):
    for k, v in default_dict.items():
        v_type = type(v)
        if v is None:
            v_type = str
        elif isinstance(v, bool):
            v_type = str2bool
        parser.add_argument(f"--{k}", default=v, type=v_type)


def args_to_dict(args, keys):
    backups = {"allow_interactions_between_padding": True}
    return {k: getattr(args, k) if hasattr(args, k) else backups[k] for k in keys}


def str2bool(v):
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    elif v.lower() in ("no", "false", "f", "n", "0"):
        return False
    else:
        raise argparse.ArgumentTypeError("boolean value expected")


def set_random_seed(seed):
    random.seed(seed)
    np.random.seed(seed)
