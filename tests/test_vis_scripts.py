"""CLI smoke tests for the visualisation/utility scripts (reference
scripts/samples2video*.py, samples2diffusion_steps.py, video_plot.py,
read_eval.py, indepentify_masks.py) — synthetic sample files in, rendered
artifacts out. No jax involved; pure subprocess runs."""

import os
import pickle
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent


def run(cmd):
    env = dict(os.environ, PYTHONPATH=f"{REPO}:{os.environ.get('PYTHONPATH', '')}")
    env.pop("XLA_FLAGS", None)
    r = subprocess.run(
        cmd, cwd=REPO, env=env, capture_output=True, text=True, timeout=600
    )
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout[-2000:]}\nSTDERR:{r.stderr[-2000:]}"
    return r


def _write_samples(eval_dir, n_videos=2, n_seeds=2, T=8, size=16):
    """uint8 (T, C, H, W) sample files in the sampler's output layout."""
    sdir = eval_dir / "samples"
    sdir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for v in range(n_videos):
        for k in range(n_seeds):
            arr = rng.integers(0, 256, size=(T, 3, size, size), dtype=np.uint8)
            np.save(sdir / f"sample_{v:04d}-{k}.npy", arr)
    return eval_dir


def test_samples2video_gif(tmp_path):
    eval_dir = _write_samples(tmp_path / "eval")
    run([sys.executable, "scripts/samples2video.py", "--eval_dir",
         str(eval_dir), "--obs_length", "2"])
    gifs = list((eval_dir / "videos").glob("*.gif"))
    assert len(gifs) == 4


def test_samples2video_array(tmp_path):
    eval_dir = _write_samples(tmp_path / "eval")
    run([sys.executable, "scripts/samples2video_array.py", "--eval_dir",
         str(eval_dir), "--n_videos", "2", "--n_seeds", "2"])
    outs = list((eval_dir / "videos").glob("*.gif")) + list(
        (eval_dir / "videos").glob("*.mp4")
    )
    assert outs, "array renderer produced no output"


def test_samples2video_long(tmp_path):
    eval_dir = tmp_path / "eval"
    sdir = eval_dir / "long_videos"
    sdir.mkdir(parents=True)
    rng = np.random.default_rng(1)
    # chained long-video files video_<k>.npy: (B, T, C, H, W) uint8
    for k in range(2):
        np.save(
            sdir / f"video_{k}.npy",
            rng.integers(0, 256, size=(1, 6, 3, 16, 16), dtype=np.uint8),
        )
    run([sys.executable, "scripts/samples2video_long.py", "--eval_dir",
         str(eval_dir), "--obs_length", "2"])
    assert list(sdir.glob("long_video_*.gif"))


def test_samples2diffusion_steps(tmp_path):
    eval_dir = tmp_path / "eval"
    sdir = eval_dir / "samples"
    sdir.mkdir(parents=True)
    rng = np.random.default_rng(2)
    # (n_timesteps, T, C, H, W) uint8 per-timestep reconstruction array
    np.save(
        sdir / "all_timestep_sample_0000-0.npy",
        rng.integers(0, 256, size=(4, 5, 3, 16, 16), dtype=np.uint8),
    )
    run([sys.executable, "scripts/samples2diffusion_steps.py", "--eval_dir",
         str(eval_dir), "--every_k_timesteps", "2"])
    outs = list((eval_dir / "diffusion_steps").glob("*.png"))
    assert outs, "diffusion-steps renderer produced no output"


def test_video_plot(tmp_path):
    import imageio

    rng = np.random.default_rng(3)
    gif = tmp_path / "row.gif"
    imageio.mimwrite(
        gif, [rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
              for _ in range(10)],
    )
    out = tmp_path / "plot.pdf"
    run([sys.executable, "scripts/video_plot.py", str(gif), "--out", str(out)])
    assert out.exists() and out.stat().st_size > 0


def test_read_eval(tmp_path):
    pkl = tmp_path / "metrics_2-1-8.pkl"
    with open(pkl, "wb") as f:
        pickle.dump({"ssim": np.ones((2, 1, 8)), "psnr": 20 * np.ones((2, 1, 8))}, f)
    r = run([sys.executable, "scripts/read_eval.py", str(pkl)])
    assert "ssim" in r.stdout


def test_indepentify_masks(tmp_path):
    # (obs_list, lat_list) pickle -> one single-latent step per latent frame
    obs_list = [[0, 1], [2, 3]]
    lat_list = [[2, 3], [4, 5]]
    path = tmp_path / "masks.pkl"
    with open(path, "wb") as f:
        pickle.dump((obs_list, lat_list), f)
    out = tmp_path / "indep.pkl"
    run([sys.executable, "scripts/indepentify_masks.py", str(path),
         "--out", str(out)])
    with open(out, "rb") as f:
        new_obs, new_lat = pickle.load(f)
    assert new_lat == [[2], [3], [4], [5]]
    assert new_obs == [[0, 1], [0, 1], [2, 3], [2, 3]]
