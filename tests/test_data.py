"""Dataset/loader tests: synthetic + bouncy-balls physics generator + batch
loader + image folder + eval-dir naming + logger kv semantics."""

import os
import sys
from argparse import Namespace

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "datasets"))


def test_synthetic_dataset_deterministic():
    from video_diffusion_tpu.data.datasets import SyntheticVideoDataset

    ds = SyntheticVideoDataset(T=12, image_size=32, n_videos=4)
    v1, _ = ds[0]
    v2, _ = ds[0]
    np.testing.assert_array_equal(v1, v2)
    assert v1.shape == (12, 32, 32, 3)
    assert -1 <= v1.min() and v1.max() <= 1
    v3, _ = ds[1]
    assert np.abs(v1 - v3).max() > 0.1


def test_bouncy_balls_generator_and_loader(tmp_path):
    import torch

    from bouncy_balls import render, simulate
    from video_diffusion_tpu.data.datasets import TensorVideoDataset

    rng = np.random.default_rng(0)
    videos = np.stack(
        [render(simulate(rng, T=8, n_balls=2), res=32) for _ in range(3)]
    )
    assert videos.shape == (3, 8, 1, 32, 32)
    assert 0 <= videos.min() and videos.max() <= 1
    # energy sanity: balls keep moving (frames differ)
    assert np.abs(videos[:, 0] - videos[:, -1]).max() > 0.1
    path = tmp_path / "train.pt"
    torch.save(torch.from_numpy(videos), path)
    ds = TensorVideoDataset(str(path))
    vid, _ = ds[0]
    assert vid.shape == (8, 32, 32, 3)  # grayscale -> RGB, channels-last
    assert -1 <= vid.min() and vid.max() <= 1
    np.testing.assert_array_equal(vid[..., 0], vid[..., 1])


def test_batch_loader_shapes():
    from video_diffusion_tpu.data.datasets import SyntheticVideoDataset, _BatchLoader

    ds = SyntheticVideoDataset(T=6, image_size=16, n_videos=10)
    loader = _BatchLoader(ds, batch_size=4, seed=0)
    batch, kwargs = next(loader)
    assert batch.shape == (4, 6, 16, 16, 3)
    assert kwargs == {}


def test_image_dataset_and_class_labels(tmp_path):
    from PIL import Image

    from video_diffusion_tpu.data.datasets import load_data

    for i, cls in enumerate(["cat", "dog", "cat", "dog"]):
        arr = np.random.randint(0, 255, (48, 48, 3), dtype=np.uint8)
        Image.fromarray(arr).save(tmp_path / f"{cls}_{i:03d}.png")
    gen = load_data(
        data_dir=str(tmp_path), batch_size=2, image_size=32, class_cond=True
    )
    batch, kwargs = next(gen)
    assert batch.shape == (2, 32, 32, 3)
    assert set(np.unique(kwargs["y"])) <= {0, 1}
    assert -1 <= batch.min() and batch.max() <= 1


def test_eval_dir_naming_contract():
    """results/<ckpt_subpath>/<name>/<mode>_<max_frames>_<step>_<T>_<obs>
    (reference test_util.py:65-132, README contract)."""
    from video_diffusion_tpu.utils import eval_util

    args = Namespace(
        checkpoint_path="checkpoints/abc123/model_020000.pt",
        eval_dir=None, use_ddim=False, timestep_respacing="",
        inference_mode="autoreg", optimality=None, max_frames=20,
        step_size=1, T=300, obs_length=36,
    )
    path = eval_util.get_model_results_path(args)
    assert str(path) == "results/abc123/model_020000"
    ident = eval_util.get_eval_run_identifier(args)
    assert ident == "autoreg_20_1_300_36"
    args.optimality = "linspace-t"
    args.use_gradient_method = True
    args.dataset_partition = "train"
    ident = eval_util.get_eval_run_identifier(args)
    assert ident == (
        "gradientmethod_trainset_autoreg_optimal-linspace-t_20_1_300_36"
    )
    args2 = Namespace(
        checkpoint_path="x/checkpoints/r1/ema_0.9999_010000.pt",
        eval_dir=None, use_ddim=True, timestep_respacing="250",
    )
    assert str(eval_util.get_model_results_path(args2)) == (
        "results/r1/ema_0.9999_010000_ddim_respace250"
    )


def test_logger_kv_semantics(tmp_path):
    from video_diffusion_tpu.utils import logger

    logger.configure(dir=str(tmp_path), format_strs=["csv", "json"])
    logger.logkv("a", 1.0)
    logger.logkv_mean("b", 2.0)
    logger.logkv_mean("b", 4.0)
    out = logger.dumpkvs()
    assert out["a"] == 1.0 and out["b"] == 3.0
    logger.logkv("c", 5.0)
    logger.dumpkvs()
    assert (tmp_path / "progress.csv").exists()
    assert (tmp_path / "progress.json").exists()
    with logger.profile_kv("myscope"):
        pass
    assert "wait_myscope" in logger.getkvs()
    logger.reset()


def test_bair_png_dir_layout(tmp_path):
    """BairPushingDataset must read the reference converter's per-clip PNG
    tree (<split>/<tfrecord-stem>/<k>/<i>.png, reference
    datasets/convert_bair.py:15-59), with numeric frame ordering."""
    from PIL import Image

    from video_diffusion_tpu.data.datasets import BairPushingDataset

    root = tmp_path / "test"
    n_frames = 12  # >10 so lexicographic ordering would scramble frames
    for stem, k in (("traj_0_to_255", 1), ("traj_0_to_255", 2),
                    ("traj_256_to_511", 1)):
        d = root / stem / str(k)
        d.mkdir(parents=True)
        for i in range(n_frames):
            arr = np.full((64, 64, 3), i * 20, dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")

    ds = BairPushingDataset(train=False, path=str(root), T=n_frames)
    assert len(ds) == 3
    video, _ = ds[0]
    video = np.asarray(video)
    assert video.shape == (n_frames, 64, 64, 3)
    assert video.min() >= -1.0 and video.max() <= 1.0
    # frame i has constant value i*20 -> [-1,1]; ordering must be numeric
    expect = np.array([i * 20 / 255.0 * 2 - 1 for i in range(n_frames)])
    np.testing.assert_allclose(video.mean(axis=(1, 2, 3)), expect, atol=1e-6)

    # sharding slices the clip list
    ds_half = BairPushingDataset(train=False, path=str(root), T=n_frames,
                                 shard=0, num_shards=2)
    assert len(ds_half) == 2


def test_bair_pt_csv_layout(tmp_path):
    """The carla-style .pt+csv layout keeps working through the same class."""
    import torch

    from video_diffusion_tpu.data.datasets import BairPushingDataset

    root = tmp_path / "train"
    root.mkdir()
    vids = []
    for i in range(2):
        v = np.random.default_rng(i).integers(
            0, 255, (6, 64, 64, 3), dtype=np.uint8
        )
        torch.save(torch.from_numpy(v), root / f"video_{i:05d}.pt")
        vids.append(v)
    (root / "video_train.csv").write_text(
        "video_00000.pt\nvideo_00001.pt\n"
    )
    ds = BairPushingDataset(train=True, path=str(root), T=6)
    assert len(ds) == 2
    video, _ = ds[0]
    np.testing.assert_allclose(
        np.asarray(video), vids[0].astype(np.float32) / 255 * 2 - 1, atol=1e-6
    )


def test_csv_sink_widens_without_row_cache(tmp_path):
    """CsvSink re-reads the on-disk file when a new key appears (no
    unbounded in-memory mirror); earlier rows get empty cells for the new
    column and data survives the widen."""
    from video_diffusion_tpu.utils.logger import CsvSink

    path = tmp_path / "progress.csv"
    s = CsvSink(str(path))
    s.row({"a": 1})
    s.row({"a": 2})
    assert not hasattr(s, "rows")  # no in-memory mirror
    s.row({"a": 3, "b": 7})  # widen
    lines = path.read_text().strip().split("\n")
    assert lines[0] == "a,b"
    assert lines[1:] == ["1,", "2,", "3,7"]
    s.row({"b": 8})  # append after widen, missing key -> empty cell
    assert path.read_text().strip().split("\n")[-1] == ",8"


def test_csv_sink_comma_values_survive_widen(tmp_path):
    """Values whose str() contains commas (tuples, messages) are quoted by
    csv.writer, and the widen-rewrite re-parses them with csv.reader, so
    columns never silently shift (advisor round-3 finding)."""
    import csv

    from video_diffusion_tpu.utils.logger import CsvSink

    path = tmp_path / "progress.csv"
    s = CsvSink(str(path))
    s.row({"a": (1, 2), "msg": "hello, world"})
    s.row({"a": (3, 4), "msg": "x", "b": 9})  # widen re-reads from disk
    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    assert rows[0] == {"a": "(1, 2)", "msg": "hello, world", "b": ""}
    assert rows[1] == {"a": "(3, 4)", "msg": "x", "b": "9"}
