"""End-to-end CLI smoke tests (train -> checkpoint -> sample -> eval), run in
subprocesses like a user would. The heaviest test in the default suite
(several subprocess compiles, tiny shapes, CPU); set VDT_SKIP_E2E=1 to skip
during fast iteration."""

import json
import os
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    bool(os.environ.get("VDT_SKIP_E2E")), reason="VDT_SKIP_E2E set"
)

REPO = Path(__file__).resolve().parent.parent


def run(cmd, **env):
    full_env = dict(
        os.environ,
        JAX_PLATFORM_NAME="cpu",
        PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}",
        **env,
    )
    # the in-process suite forces an 8-device virtual CPU mesh via conftest;
    # the CLI subprocesses must see a plain single-device CPU host
    full_env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        cmd, cwd=REPO, env=full_env, capture_output=True, text=True, timeout=3000
    )
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout[-3000:]}\nSTDERR:{r.stderr[-3000:]}"
    return r


def test_train_sample_eval_roundtrip(tmp_path):
    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    run(
        [sys.executable, "scripts/video_train.py", "--dataset", "synthetic",
         "--T", "20", "--image_size", "32", "--num_channels", "32",
         "--num_res_blocks", "1", "--num_heads", "2", "--max_frames", "5",
         "--batch_size", "2", "--iterations", "5", "--save_interval", "2",
         "--log_interval", "1", "--sample_interval", "100000"],
        DIFFUSION_TRAINING_TEST="1",
        DIFFUSION_BLOB_LOGDIR=str(ckdir),
        OPENAI_LOGDIR=str(tmp_path / "logs"),
        VDT_RUN_ID="e2e",
    )
    ckpt = ckdir / "e2e" / "model_latest.pt"
    assert ckpt.exists()

    run(
        [sys.executable, "scripts/video_sample.py", str(ckpt),
         "--inference_mode", "autoreg", "--obs_length", "2", "--step_size", "2",
         "--max_frames", "5", "--T", "10", "--subset_size", "1",
         "--batch_size", "1", "--timestep_respacing", "ddim5",
         "--use_bf16", "False", "--eval_dir", str(tmp_path / "eval")],
    )
    # samples land under the config-derived run identifier
    # (<mode>_<max_frames>_<step_size>_<T>_<obs_length>, test_util.py:109-132)
    eval_dir = tmp_path / "eval" / "autoreg_5_2_10_2"
    samples = list((eval_dir / "samples").glob("sample_*.npy"))
    assert len(samples) == 1
    arr = np.load(samples[0])
    assert arr.shape == (10, 3, 32, 32) and arr.dtype == np.uint8
    assert (eval_dir / "model_config.json").exists()
    cfg = json.loads((eval_dir / "model_config.json").read_text())
    assert cfg["dataset"] == "synthetic"

    run(
        [sys.executable, "scripts/video_eval.py", "--eval_dir",
         str(eval_dir), "--obs_length", "2", "--T", "10",
         "--modes", "ssim"],
    )
    pkls = list(eval_dir.glob("metrics_*.pkl"))
    assert len(pkls) == 1
