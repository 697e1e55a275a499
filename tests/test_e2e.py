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


def run(cmd, cwd=None, **env):
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
        cmd, cwd=cwd or REPO, env=full_env, capture_output=True, text=True,
        timeout=3000,
    )
    assert r.returncode == 0, f"{cmd}\nSTDOUT:{r.stdout[-3000:]}\nSTDERR:{r.stderr[-3000:]}"
    return r


def _write_png_dir(path, n=4, size=64):
    """Tiny image-folder dataset with class-from-filename labels
    (reference image_datasets.py:75-130 layout)."""
    from PIL import Image

    path.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        arr = rng.integers(0, 256, size=(size, size, 3), dtype=np.uint8)
        Image.fromarray(arr).save(path / f"class{i % 2}_{i:03d}.png")


# shared tiny-model flags; image_sample/image_nll rebuild the model from CLI
# flags (reference scripts/image_sample.py semantics), so train and downstream
# commands must agree on these
IMG_FLAGS = [
    "--image_size", "32", "--num_channels", "32", "--num_res_blocks", "1",
    "--num_heads", "2", "--diffusion_steps", "32", "--use_bf16", "False",
]


def test_image_train_sample_nll_roundtrip(tmp_path):
    """The original improved-diffusion image pipeline end-to-end
    (reference scripts/image_train.py + image_sample.py:59-66 +
    image_nll.py:46-83): train 3 steps, sample to samples_*.npz, bpd eval."""
    data_dir = tmp_path / "images"
    _write_png_dir(data_dir, n=4, size=64)
    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    run(
        [sys.executable, "scripts/image_train.py", "--data_dir", str(data_dir),
         *IMG_FLAGS, "--batch_size", "2", "--iterations", "3",
         "--save_interval", "2", "--log_interval", "1", "--lr", "1e-4",
         "--save_latest_only", "True"],
        DIFFUSION_TRAINING_TEST="1",
        DIFFUSION_BLOB_LOGDIR=str(ckdir),
        OPENAI_LOGDIR=str(tmp_path / "logs"),
        VDT_RUN_ID="img-e2e",
    )
    ckpt = ckdir / "img-e2e" / "model_latest.pt"
    assert ckpt.exists()

    sample_dir = tmp_path / "sample-out"
    run(
        [sys.executable, "scripts/image_sample.py", "--model_path", str(ckpt),
         *IMG_FLAGS, "--num_samples", "2", "--batch_size", "2",
         "--use_ddim", "True", "--timestep_respacing", "ddim2"],
        OPENAI_LOGDIR=str(sample_dir),
    )
    npzs = list(sample_dir.glob("samples_*.npz"))
    assert len(npzs) == 1
    with np.load(npzs[0]) as obj:
        arr = obj["arr_0"]
    assert arr.shape == (2, 32, 32, 3) and arr.dtype == np.uint8

    nll_dir = tmp_path / "nll-out"
    run(
        [sys.executable, "scripts/image_nll.py", "--model_path", str(ckpt),
         "--data_dir", str(data_dir), *IMG_FLAGS,
         "--num_samples", "2", "--batch_size", "2"],
        OPENAI_LOGDIR=str(nll_dir),
    )
    for name in ("vb", "mse", "xstart_mse"):
        terms = list(nll_dir.glob(f"{name}_terms.npz"))
        assert len(terms) == 1
        with np.load(terms[0]) as obj:
            t = obj["arr_0"]
        assert t.shape == (32,) and np.isfinite(t).all()


def test_super_res_train_sample_roundtrip(tmp_path):
    """SR cascade end-to-end (reference scripts/super_res_train.py:60-75 +
    super_res_sample.py:76-99): train on (64, area-downsampled 16) pairs,
    then super-resolve a base npz of 16x16 images to 64x64."""
    data_dir = tmp_path / "images"
    _write_png_dir(data_dir, n=4, size=64)
    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    sr_flags = [
        "--large_size", "64", "--small_size", "16", "--num_channels", "32",
        "--num_res_blocks", "1", "--num_heads", "2", "--diffusion_steps", "32",
        "--use_bf16", "False",
    ]
    run(
        [sys.executable, "scripts/super_res_train.py",
         "--data_dir", str(data_dir), *sr_flags, "--batch_size", "1",
         "--iterations", "2", "--save_interval", "1", "--log_interval", "1",
         "--save_latest_only", "True"],
        DIFFUSION_TRAINING_TEST="1",
        DIFFUSION_BLOB_LOGDIR=str(ckdir),
        OPENAI_LOGDIR=str(tmp_path / "logs"),
        VDT_RUN_ID="sr-e2e",
    )
    ckpt = ckdir / "sr-e2e" / "model_latest.pt"
    assert ckpt.exists()

    # base model output stand-in: uint8 low-res images in arr_0
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, size=(2, 16, 16, 3), dtype=np.uint8)
    base_path = tmp_path / "samples_2x16x16x3.npz"
    np.savez(base_path, base)

    sample_dir = tmp_path / "sr-out"
    run(
        [sys.executable, "scripts/super_res_sample.py",
         "--model_path", str(ckpt), "--base_samples", str(base_path),
         *sr_flags, "--num_samples", "2", "--batch_size", "2",
         "--use_ddim", "True", "--timestep_respacing", "ddim2"],
        OPENAI_LOGDIR=str(sample_dir),
    )
    npzs = list(sample_dir.glob("samples_*.npz"))
    assert len(npzs) == 1
    with np.load(npzs[0]) as obj:
        arr = obj["arr_0"]
    assert arr.shape == (2, 64, 64, 3) and arr.dtype == np.uint8


def test_dry_run_visualisation_modes(tmp_path):
    """The reference's manual-test surfaces (SURVEY §4): video_sample
    --just_visualise renders the schedule PNG without touching a checkpoint
    (reference video_sample.py:311-401), video_train --just_save_masks dumps
    mask index draws (train_util.py:800-816), and --just_visualise renders
    mask/noise grids (train_util.py:758-798)."""
    # schedule visualisation: no checkpoint needed (script exits before load)
    run(
        [sys.executable, str(REPO / "scripts/video_sample.py"), "dummy.pt",
         "--inference_mode", "hierarchy-2", "--just_visualise",
         "--T", "24", "--max_frames", "6", "--obs_length", "4",
         "--step_size", "3", "--eval_dir", str(tmp_path / "eval")],
        cwd=tmp_path,
    )
    pngs = list((tmp_path / "visualisations").glob("sample_vis_*"))
    assert pngs, "schedule visualisation not written"

    common = [
        sys.executable, str(REPO / "scripts/video_train.py"),
        "--dataset", "synthetic", "--T", "12", "--image_size", "32",
        "--num_channels", "32", "--num_res_blocks", "1", "--num_heads", "2",
        "--max_frames", "4", "--batch_size", "1",
    ]
    run(
        common + ["--just_save_masks", "True"],
        cwd=tmp_path, OPENAI_LOGDIR=str(tmp_path / "logs-masks"),
    )
    dumps = list((tmp_path / "samples" / "indices").glob("*_frame_indices.pt"))
    assert len(dumps) == 1

    run(
        common + ["--just_visualise", "True"],
        cwd=tmp_path, OPENAI_LOGDIR=str(tmp_path / "logs-vis"),
    )
    vis = [p for p in (tmp_path / "logs-vis").rglob("*.png")]
    assert vis, "mask/noise visualisation not written"


def test_long_nll_fvd_roundtrip(tmp_path):
    """The remaining video CLIs on one shared tiny checkpoint:
    video_sample_long (chained unbounded generation + idempotent resume,
    reference scripts/video_sample_long.py:49-136), video_nll (masked ELBO
    pickles, video_nll.py:142-188), video_fvd (standalone FVD txt,
    video_fvd.py:111-162)."""
    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    run(
        [sys.executable, "scripts/video_train.py", "--dataset", "synthetic",
         "--T", "20", "--image_size", "32", "--num_channels", "32",
         "--num_res_blocks", "1", "--num_heads", "2", "--max_frames", "5",
         "--batch_size", "2", "--iterations", "3", "--save_interval", "2",
         "--log_interval", "1", "--sample_interval", "0"],
        DIFFUSION_TRAINING_TEST="1",
        DIFFUSION_BLOB_LOGDIR=str(ckdir),
        OPENAI_LOGDIR=str(tmp_path / "logs"),
        VDT_RUN_ID="e2e-long",
    )
    ckpt = ckdir / "e2e-long" / "model_latest.pt"
    assert ckpt.exists()

    # --- video_sample_long: 2 chained chunks, then an idempotent resume ---
    long_dir = tmp_path / "long"
    cmd_long = [
        sys.executable, "scripts/video_sample_long.py", str(ckpt),
        "--num_chunks", "2", "--T", "10", "--max_frames", "5",
        "--obs_length", "2", "--step_size", "2",
        "--timestep_respacing", "ddim2", "--use_bf16", "False",
        "--eval_dir", str(long_dir),
    ]
    run(cmd_long)
    chunk_dir = long_dir / "long_videos"
    chunks = sorted(chunk_dir.glob("video_*.npy"))
    assert [c.name for c in chunks] == ["video_0.npy", "video_1.npy"]
    a0 = np.load(chunks[0])
    assert a0.shape == (1, 10, 3, 32, 32) and a0.dtype == np.uint8
    assert (chunk_dir / "chain_config.json").exists()
    # chunk 1 conditions on chunk 0's tail: its observed prefix must equal
    # the previous chunk's last obs_length frames
    a1 = np.load(chunks[1])
    np.testing.assert_array_equal(a1[:, :2], a0[:, -2:])
    mtimes = [c.stat().st_mtime_ns for c in chunks]
    run(cmd_long)  # resume: existing chunks are skipped untouched
    assert [c.stat().st_mtime_ns for c in chunks] == mtimes

    # --- video_nll: masked ELBO to per-video pickles ---
    nll_dir = tmp_path / "nll"
    run(
        [sys.executable, "scripts/video_nll.py", str(ckpt),
         "--T", "10", "--obs_length", "2", "--max_frames", "5",
         "--step_size", "2", "--num_videos", "1", "--num_timesteps", "2",
         "--eval_dir", str(nll_dir)],
    )
    import pickle

    # video_nll nests the run identifier exactly like video_sample
    elbos = list((nll_dir / "autoreg_5_2_10_2" / "elbos").glob("elbo_*.pkl"))
    assert len(elbos) == 1
    with open(elbos[0], "rb") as f:
        result = pickle.load(f)
    flat = result if isinstance(result, list) else [result]
    assert all(np.isfinite(np.asarray(r["total_bpd"])).all() for r in flat)

    # --- video_fvd: needs a samples dir + model_config.json ---
    run(
        [sys.executable, "scripts/video_sample.py", str(ckpt),
         "--inference_mode", "autoreg", "--obs_length", "2", "--step_size", "2",
         "--max_frames", "5", "--T", "10", "--subset_size", "2",
         "--batch_size", "2", "--timestep_respacing", "ddim2",
         "--use_bf16", "False", "--eval_dir", str(tmp_path / "fvd-eval")],
    )
    eval_dir = tmp_path / "fvd-eval" / "autoreg_5_2_10_2"
    run(
        [sys.executable, "scripts/video_fvd.py", "--eval_dir", str(eval_dir),
         "--T", "10", "--batch_size", "2"],
    )
    txts = list(eval_dir.glob("fvd-*.txt"))
    assert len(txts) == 1
    first = txts[0].read_text().splitlines()[0]
    assert np.isfinite(float(first))


def test_google_cascade_roundtrip(tmp_path):
    """Two-model frameskip-4 -> frameskip-1 cascade end-to-end (reference
    scripts/video_sample_google.py:74-79 + video_nll_google.py): train a tiny
    fs4 (max_frames 16) / fs1 (max_frames 9) pair on the synthetic dataset,
    sample one video through the cascade, then cascade NLL to an elbo pickle."""
    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    ckpts = {}
    for phase, max_frames in (("fs4", 16), ("fs1", 9)):
        run(
            [sys.executable, "scripts/video_train.py", "--dataset", "synthetic",
             "--T", "100", "--image_size", "32", "--num_channels", "32",
             "--num_res_blocks", "1", "--num_heads", "2",
             "--max_frames", str(max_frames), "--batch_size", "1",
             "--iterations", "2", "--save_interval", "1", "--log_interval", "1",
             "--sample_interval", "0"],
            DIFFUSION_TRAINING_TEST="1",
            DIFFUSION_BLOB_LOGDIR=str(ckdir),
            OPENAI_LOGDIR=str(tmp_path / f"logs-{phase}"),
            VDT_RUN_ID=f"goog-{phase}",
        )
        ckpts[phase] = ckdir / f"goog-{phase}" / "model_latest.pt"
        assert ckpts[phase].exists()

    run(
        [sys.executable, "scripts/video_sample_google.py",
         str(ckpts["fs4"]), str(ckpts["fs1"]),
         "--T", "100", "--obs_length", "36", "--subset_size", "1",
         "--batch_size", "1", "--timestep_respacing", "ddim2",
         "--use_bf16", "False", "--eval_dir", str(tmp_path / "eval")],
    )
    # run identifier: <mode>_<max_frames>_<step_size>_<T>_<obs_length>
    eval_dir = tmp_path / "eval" / "google_16_8_100_36"
    samples = list((eval_dir / "samples").glob("sample_*.npy"))
    assert len(samples) == 1
    arr = np.load(samples[0])
    assert arr.shape == (100, 3, 32, 32) and arr.dtype == np.uint8

    run(
        [sys.executable, "scripts/video_nll_google.py",
         str(ckpts["fs4"]), str(ckpts["fs1"]),
         "--T", "100", "--obs_length", "36", "--num_videos", "1",
         "--num_timesteps", "2", "--eval_dir", str(eval_dir)],
    )
    import pickle

    elbos = list((eval_dir / "elbos").glob("elbo_*.pkl"))
    assert len(elbos) == 1
    with open(elbos[0], "rb") as f:
        results = pickle.load(f)
    phases = {r["phase"] for r in results}
    assert phases == {"fs4", "fs1"}
    assert all(np.isfinite(r["total_bpd"]).all() for r in results)


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


def test_optimal_schedule_search_then_consume(tmp_path):
    """Search -> optimal_schedule.pt -> video_sample --optimality consumes it
    (reference video_optimal_schedule.py:222-354 producing the pickle that
    inference_util.py:95-103 reads). Both CLIs derive the same
    <eval_dir>/<mode>_optimal-<optimality>_... run dir, which is the
    consumption contract."""
    import pickle

    ckdir = tmp_path / "checkpoints"
    ckdir.mkdir()
    run(
        [sys.executable, "scripts/video_train.py", "--dataset", "synthetic",
         "--T", "20", "--image_size", "32", "--num_channels", "32",
         "--num_res_blocks", "1", "--num_heads", "2", "--max_frames", "5",
         "--batch_size", "2", "--iterations", "3", "--save_interval", "2",
         "--log_interval", "1", "--sample_interval", "100000"],
        DIFFUSION_TRAINING_TEST="1",
        DIFFUSION_BLOB_LOGDIR=str(ckdir),
        OPENAI_LOGDIR=str(tmp_path / "logs"),
        VDT_RUN_ID="sched",
    )
    ckpt = ckdir / "sched" / "model_latest.pt"
    assert ckpt.exists()

    opt = "linspace-t-force-nearby"
    common = ["--inference_mode", "autoreg", "--obs_length", "2",
              "--step_size", "2", "--max_frames", "5", "--T", "10",
              "--timestep_respacing", "ddim5"]
    run(
        [sys.executable, "scripts/video_optimal_schedule.py", str(ckpt),
         "--optimality", opt, "--num_videos", "1", "--num_t", "2",
         *common, "--eval_dir", str(tmp_path / "eval")],
        DIFFUSION_TRAINING_TEST="1",
    )
    run_dir = tmp_path / "eval" / f"autoreg_optimal-{opt}_5_2_10_2"
    sched_path = run_dir / "optimal_schedule.pt"
    assert sched_path.exists(), list((tmp_path / "eval").glob("**/*"))
    with open(sched_path, "rb") as f:
        schedule = pickle.load(f)
    # every strategy step is present, obs sets are within budget and drawn
    # from already-done frames
    assert set(schedule) == set(range(len(schedule))) and len(schedule) >= 2
    for s, obs_set in schedule.items():
        assert len(obs_set) <= 3  # max_frames - len(latents) = 5 - 2
        assert all(0 <= i < 10 for i in obs_set)

    run(
        [sys.executable, "scripts/video_sample.py", str(ckpt),
         *common, "--subset_size", "1", "--batch_size", "1",
         "--num_samples", "1", "--optimality", opt, "--use_bf16", "False",
         "--eval_dir", str(tmp_path / "eval")],
        DIFFUSION_TRAINING_TEST="1",
    )
    samples = list((run_dir / "samples").glob("sample_*.npy"))
    assert len(samples) == 1
    arr = np.load(samples[0])
    assert arr.shape == (10, 3, 32, 32) and arr.dtype == np.uint8
