"""Strategy-level evaluation driver (VERDICT r2 item 3): run the inference
strategy library end-to-end on a trained checkpoint and collect a
per-strategy metrics table.

For each mode it shells out to the real user surface —
scripts/video_sample.py then scripts/video_eval.py — exactly as the
reference pipeline does (reference inference_util.py:779-799 registry;
video_eval.py:343-396 metrics merge), then reads each metrics pickle and
prints one summary table (also written to results_artifacts/strategy_eval.json).

Usage:
  python baselines/strategy_eval.py <checkpoint> [--T 100] [--n 64]
      [--modes autoreg independent exp-past hierarchy-2]
      [--respace ddim250] [--obs_length 5] [--step_size 5] [--seeds 1]

Samplers are idempotent (existing sample files are skipped), so this driver
is restartable; VDT_T_CHUNK bounds device-call length for the tunnel.
"""

import argparse
import json
import os
import pickle
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cmd, env_extra=None):
    env = dict(os.environ)
    env.setdefault("VDT_T_CHUNK", "250")
    # VDT_PALLAS_ATTN is NOT defaulted on here: the models this driver is
    # pointed at (bouncy-balls, C=128/H=4 -> F=32) fall below the F>=64
    # shape gate anyway (models/unet.py use_fused_attention), and the F<64
    # loop kernel does not finish Mosaic compilation on TPU
    # (NOTES_ROUND3.md). Opt in from the caller's environment for F>=64
    # checkpoints.
    if env_extra:
        env.update(env_extra)
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, cwd=REPO, env=env, check=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("checkpoint")
    ap.add_argument("--T", type=int, default=100)
    ap.add_argument("--n", type=int, default=64, help="test videos")
    ap.add_argument("--seeds", type=int, default=1, help="samples per video")
    ap.add_argument("--modes", nargs="*", default=[
        "autoreg", "independent", "exp-past", "hierarchy-2",
    ])
    ap.add_argument("--obs_length", type=int, default=5)
    ap.add_argument("--step_size", type=int, default=5)
    ap.add_argument("--max_frames", type=int, default=10)
    ap.add_argument("--respace", type=str, default="",
                    help="e.g. ddim250; empty = full DDPM")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--eval_root", type=str, default="results/strategy-eval")
    ap.add_argument("--tag", type=str, default="",
                    help="nest this run's rows under strategy_eval.json[tag] "
                    "(e.g. the checkpoint step) instead of the top level, so "
                    "reruns on deeper checkpoints don't overwrite history")
    args = ap.parse_args()

    table = {}
    for mode in args.modes:
        eval_root = f"{args.eval_root}-{mode}"
        cmd = [
            sys.executable, "scripts/video_sample.py", args.checkpoint,
            "--inference_mode", mode,
            "--obs_length", str(args.obs_length),
            "--step_size", str(args.step_size),
            "--max_frames", str(args.max_frames),
            "--T", str(args.T),
            "--subset_size", str(args.n),
            "--batch_size", str(args.batch_size),
            "--num_samples", str(args.seeds),
            "--eval_dir", eval_root,
        ]
        if args.respace:
            cmd += ["--timestep_respacing", args.respace]
        run(cmd)

        # eval dir layout: <root>/<mode>_<max_frames>_<step_size>_<T>_<obs>
        ident = (
            f"{mode}_{args.max_frames}_{args.step_size}_{args.T}_"
            f"{args.obs_length}"
        )
        eval_dir = os.path.join(eval_root, ident)
        if not os.path.isdir(eval_dir):
            # fall back: single subdirectory
            subdirs = [
                d for d in os.listdir(eval_root)
                if os.path.isdir(os.path.join(eval_root, d))
            ]
            assert len(subdirs) == 1, (eval_root, subdirs)
            eval_dir = os.path.join(eval_root, subdirs[0])
        run([
            sys.executable, "scripts/video_eval.py",
            "--eval_dir", eval_dir,
            "--obs_length", str(args.obs_length),
            "--T", str(args.T),
            "--num_samples", str(args.seeds),
        ])
        pkl = os.path.join(
            eval_dir, f"metrics_{args.n}-{args.seeds}-{args.T}.pkl"
        )
        with open(pkl, "rb") as f:
            metrics = pickle.load(f)
        row = {}
        for k, v in metrics.items():
            if k.startswith("_provenance"):
                if k == "_provenance/fvd_degenerate":
                    row["fvd_degenerate"] = True
                continue
            try:
                import numpy as np

                row[k] = float(np.asarray(v).mean())
            except Exception:
                pass
        table[mode] = row
        print(f"[{mode}] {row}", flush=True)

    os.makedirs(os.path.join(REPO, "results_artifacts"), exist_ok=True)
    out = os.path.join(REPO, "results_artifacts", "strategy_eval.json")
    existing = {}
    if os.path.exists(out):
        with open(out) as f:
            existing = json.load(f)
    if args.tag:
        existing.setdefault(args.tag, {}).update(table)
    else:
        existing.update(table)
    with open(out, "w") as f:
        json.dump(existing, f, indent=2)
    print(json.dumps(table, indent=2))


if __name__ == "__main__":
    main()
