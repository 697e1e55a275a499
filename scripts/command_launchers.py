"""Process farm-out launchers (reference scripts/command_launchers.py): run a
list of shell commands locally, serially, or greedily over accelerators.

On a TPU host there is one accelerator runtime per process, so the multi-GPU
CUDA_VISIBLE_DEVICES farm-out becomes a simple worker pool keyed by
TPU_VISIBLE_CHIPS (or plain sequential execution on a single chip).
"""

import os
import subprocess
import time


def local_launcher(commands):
    """Sequentially run commands in the local environment."""
    for cmd in commands:
        subprocess.call(cmd, shell=True)


def dummy_launcher(commands):
    """Print commands instead of running them (dry run)."""
    for cmd in commands:
        print(f"Dummy launcher: {cmd}")


def multi_accel_launcher(commands, n_workers=None):
    """Greedy scheduler: assign commands to free accelerator slots via
    TPU_VISIBLE_CHIPS (counterpart of the reference's CUDA_VISIBLE_DEVICES
    farm-out, command_launchers.py:32-62)."""
    if n_workers is None:
        n_workers = int(os.environ.get("VDT_N_WORKERS", "1"))
    procs = [None] * n_workers
    commands = list(commands)
    while commands or any(p is not None for p in procs):
        for slot in range(n_workers):
            if procs[slot] is not None and procs[slot].poll() is not None:
                procs[slot] = None
            if procs[slot] is None and commands:
                cmd = commands.pop(0)
                env = dict(os.environ, TPU_VISIBLE_CHIPS=str(slot))
                print(f"[slot {slot}] {cmd}")
                procs[slot] = subprocess.Popen(cmd, shell=True, env=env)
        time.sleep(1)


REGISTRY = {
    "local": local_launcher,
    "dummy": dummy_launcher,
    "multi_gpu": multi_accel_launcher,  # name kept for CLI parity
    "multi_accel": multi_accel_launcher,
}


if __name__ == "__main__":
    import argparse
    import sys

    parser = argparse.ArgumentParser()
    parser.add_argument("--launcher", default="local", choices=REGISTRY.keys())
    parser.add_argument("--commands_file", default=None,
                        help="file with one command per line (default: stdin)")
    args = parser.parse_args()
    lines = (
        open(args.commands_file).read().splitlines()
        if args.commands_file
        else sys.stdin.read().splitlines()
    )
    REGISTRY[args.launcher]([ln for ln in lines if ln.strip()])
