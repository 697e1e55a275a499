"""Datasets and loaders.

Numpy/PIL reimplementation of /root/reference/improved_diffusion/image_datasets.py
with the same on-disk layouts (so data converted for the reference works
unchanged), the same registry dicts, and the same subsequence semantics
(random window at train time, prefix at test time; BaseDataset,
image_datasets.py:411-505).

Differences (deliberate):
* videos are returned channels-last (T, H, W, C) float32 in [-1, 1];
* dataset sharding uses jax.process_index()/process_count() — fixing the
  reference's bug of sharding by CUDA device count on multi-node runs
  (image_datasets.py:153-160, SURVEY.md §known-quirks);
* torch is used only to deserialize legacy ``.pt`` tensor files;
* a 'synthetic' dataset is added for tests/benchmarks with no data on disk.
"""

import glob
import io
import os
import queue
import shutil
import threading
from pathlib import Path

import numpy as np
from PIL import Image

from ..utils.protect import Protect

video_data_paths_dict = {
    "minerl": "datasets/minerl_navigate-torch",
    "mazes": "datasets/mazes-torch",
    "mazes_cwvae": "datasets/gqn_mazes-torch",
    "bouncy_balls": "datasets/bouncing_balls_100",
    "bouncy_balls_64": "datasets/bouncing_balls_64",
    "bair_pushing": "datasets/bair_pushing",
    "carla_with_traffic": "datasets/carla/with-traffic",
    "carla_no_traffic": "datasets/carla/no-traffic",
    "carla_town02_no_traffic": "datasets/carla/town02-no-traffic",
    "carla_no_traffic_variable_length": "datasets/carla/no-traffic-variable-length",
    "ucf101": "datasets/ucf101",
    "synthetic": "datasets/synthetic",
}

default_T_dict = {
    "minerl": 500,
    "mazes": 300,
    "mazes_cwvae": 300,
    "ucf101": 300,
    "bouncy_balls": 100,
    "bouncy_balls_64": 100,
    "bair_pushing": 30,
    "carla_with_traffic": 1000,
    "carla_no_traffic": 1000,
    "carla_town02_no_traffic": 1000,
    "synthetic": 100,
}

default_image_size_dict = {
    "minerl": 64,
    "mazes": 64,
    "mazes_cwvae": 64,
    "ucf101": 64,
    "bouncy_balls": 32,
    "bouncy_balls_64": 64,
    "bair_pushing": 64,
    "carla_with_traffic": 128,
    "carla_no_traffic": 128,
    "carla_town02_no_traffic": 128,
    "synthetic": 64,
}

default_iterations_dict = {
    "minerl": 850000,
    "mazes": 950000,
    "mazes_cwvae": 950000,
    "ucf101": 950000,
    "bouncy_balls": 950000,
    "bouncy_balls_64": 950000,
    "bair_pushing": 950000,
    "carla_with_traffic": 500000,
    "carla_no_traffic": 500000,
    "carla_town02_no_traffic": 500000,
    "synthetic": 1000,
}


def _data_root(path):
    root = os.environ.get("DATA_ROOT", "")
    return os.path.join(root, path) if root else path


def _resize_video(video, size):
    """Resize (T, H, W, C) uint8/float video to (T, size, size, C), bilinear
    per frame (torchvision Resize semantics: shorter side -> size)."""
    T, H, W, C = video.shape
    if H == size and W == size:
        return video
    scale = size / min(H, W)
    new_h, new_w = round(H * scale), round(W * scale)
    out = np.empty((T, new_h, new_w, C), dtype=video.dtype)
    as_uint8 = video.dtype == np.uint8
    for t in range(T):
        frame = video[t]
        if not as_uint8:
            frame = np.clip((frame + 1) * 127.5, 0, 255).astype(np.uint8)
        img = Image.fromarray(frame.squeeze(-1) if C == 1 else frame)
        img = img.resize((new_w, new_h), Image.BILINEAR)
        arr = np.asarray(img)
        if arr.ndim == 2:
            arr = arr[..., None]
        out[t] = arr if as_uint8 else (arr.astype(video.dtype) / 127.5 - 1)
    return out


def _load_pt(path):
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return obj


class BaseDataset:
    """Per-video-file dataset with DATA_ROOT caching and subsequence sampling
    (reference image_datasets.py:411-505)."""

    def __init__(self, path, T):
        self.T = T
        self.path = Path(path)
        self.is_test = False

    def __len__(self):
        return len(list(self.get_src_path(self.path).iterdir()))

    def __getitem__(self, idx):
        path = self.getitem_path(idx)
        self.cache_file(path)
        video = self.postprocess_video(self.loaditem(path))
        return self.get_video_subsequence(video, self.T), {}

    def getitem_path(self, idx):
        raise NotImplementedError

    def loaditem(self, path):
        raise NotImplementedError

    def postprocess_video(self, video):
        raise NotImplementedError

    def cache_file(self, path):
        if not path.exists():
            path.parent.mkdir(parents=True, exist_ok=True)
            src_path = self.get_src_path(path)
            with Protect(path):
                shutil.copyfile(str(src_path), str(path))

    @staticmethod
    def get_src_path(path):
        if os.environ.get("DATA_ROOT", ""):
            data_root = Path(os.environ["DATA_ROOT"])
            if data_root in Path(path).parents:
                return Path(*Path(path).parts[len(data_root.parts):])
        return Path(path)

    def set_test(self):
        self.is_test = True

    def get_video_subsequence(self, video, T):
        if T is None:
            return video
        if T < len(video):
            start_i = 0 if self.is_test else np.random.randint(len(video) - T + 1)
            video = video[start_i : start_i + T]
        assert len(video) == T
        return video


class TensorVideoDataset:
    """Bouncy-balls: one .pt tensor (N, T, 1|3, h, w) in [0, 1]
    (reference image_datasets.py:390-408)."""

    def __init__(self, tensor_path, shard=0, num_shards=1, image_size=None):
        tensor = _load_pt(tensor_path)
        arr = np.asarray(tensor.numpy() if hasattr(tensor, "numpy") else tensor)
        arr = arr[shard:][::num_shards]
        # Materialize the final (N, T, h, w, 3) float32 layout ONCE at init:
        # per-item moveaxis/repeat/astype used to re-copy ~160 MB per train
        # step on this host's single CPU core, gating the step rate (the
        # jitted device step is faster than the host was).
        vids = np.ascontiguousarray(
            np.moveaxis(2 * arr - 1, 2, -1), dtype=np.float32
        )  # [0,1] -> [-1,1], (N, T, h, w, C)
        if vids.shape[-1] == 1:
            vids = np.repeat(vids, 3, axis=-1)
        self.videos = vids

    def __len__(self):
        return len(self.videos)

    def __getitem__(self, idx):
        return self.videos[idx], {}  # (T, h, w, 3) view, zero-copy


class NpyVideoDataset(BaseDataset):
    """Per-video <i>.npy files of uint8 (T, H, W, C) frames — GQNMazes and
    MineRL layouts (reference image_datasets.py:670-721)."""

    def __init__(self, path, T, image_size=None, shard=0, num_shards=1):
        super().__init__(path=path, T=T)
        self.image_size = image_size

    def getitem_path(self, idx):
        return self.path / f"{idx}.npy"

    def loaditem(self, path):
        return np.load(path)

    def postprocess_video(self, video):
        video = video.astype(np.float32) / 255.0 * 2 - 1
        if self.image_size is not None and video.shape[1] != self.image_size:
            video = _resize_video(video, self.image_size)
        return video


GQNMazesDataset = NpyVideoDataset
MineRLDataset = NpyVideoDataset


class CarlaDataset(BaseDataset):
    """CSV-split .pt videos, fully preloaded in RAM
    (reference image_datasets.py:573-651). Used for CARLA and BAIR."""

    def __init__(self, train, path, shard=0, num_shards=1, image_size=None, T=None):
        super().__init__(path=path, T=T)
        self.image_size = image_size
        split_path = self.path / f"video_{'train' if train else 'test'}.csv"
        self.fnames = [
            line.rstrip("\n").split("/")[-1]
            for line in open(self.get_src_path(split_path), "r").readlines()
            if ".pt" in line
        ]
        self.fnames = self.fnames[shard::num_shards]
        self.videos = []
        for idx in range(len(self.fnames)):
            p = self.getitem_path(idx)
            self.cache_file(p)
            self.videos.append(self.postprocess_video(self.loaditem(p)))

    def getitem_path(self, idx):
        return self.path / self.fnames[idx]

    def loaditem(self, path):
        return _load_pt(path)

    def postprocess_video(self, video):
        arr = np.asarray(video.numpy() if hasattr(video, "numpy") else video)
        # stored (T, H, W, C) uint8
        arr = arr.astype(np.float32) / 255.0 * 2 - 1
        if self.image_size is not None and arr.shape[1] != self.image_size:
            arr = _resize_video(arr, self.image_size)
        return arr

    def __getitem__(self, idx):
        return self.get_video_subsequence(self.videos[idx], self.T), {}

    def __len__(self):
        return len(self.fnames)


class BairPushingDataset(CarlaDataset):
    """BAIR robot pushing, preloaded in RAM. Reads either on-disk layout:

    * carla-style ``video_<split>.csv`` + per-clip ``.pt`` tensors — what the
      reference's BairPushingDataset itself consumes
      (reference image_datasets.py:573-609) and what our
      datasets/convert_bair.py emits;
    * the reference converter's per-clip PNG directory tree
      ``<split>/<tfrecord-stem>/<k>/<i>.png``
      (reference datasets/convert_bair.py:15-59), so data converted with the
      reference tooling works unmodified.
    """

    def __init__(self, train, path, shard=0, num_shards=1, image_size=None,
                 T=None):
        split_csv = Path(path) / f"video_{'train' if train else 'test'}.csv"
        if os.path.exists(split_csv) or os.path.exists(
            BaseDataset.get_src_path(split_csv)
        ):
            super().__init__(train, path, shard, num_shards, image_size, T)
            return
        BaseDataset.__init__(self, path=path, T=T)
        self.image_size = image_size
        root = Path(path)
        clip_dirs = sorted(
            p.parent for p in root.glob("*/*/0.png")
        ) or sorted(p.parent for p in root.glob("*/0.png"))
        assert clip_dirs, (
            f"no BAIR data under {path}: neither video_*.csv (+.pt clips) "
            "nor per-clip PNG dirs (<stem>/<k>/<i>.png)"
        )
        self.fnames = [str(d.relative_to(root)) for d in clip_dirs]
        self.fnames = self.fnames[shard::num_shards]
        self.videos = [
            self.postprocess_video(self._load_png_clip(root / f))
            for f in self.fnames
        ]

    @staticmethod
    def _load_png_clip(clip_dir):
        from PIL import Image

        frames = sorted(clip_dir.glob("*.png"), key=lambda p: int(p.stem))
        return np.stack(
            [np.asarray(Image.open(f).convert("RGB")) for f in frames]
        )  # (T, H, W, C) uint8


class CarlaVariableLengthDataset(BaseDataset):
    def __init__(self, T, path=None):
        path = path or os.path.join("datasets", "carla", "no-traffic-variable-length")
        super().__init__(path=path, T=T)
        self.fnames = sorted(
            Path(p).name for p in glob.glob(os.path.join(path, "video_*.pt"))
        )

    def __len__(self):
        return len(self.fnames)

    def getitem_path(self, idx):
        return self.path / self.fnames[idx]

    def loaditem(self, path):
        return _load_pt(path)

    def postprocess_video(self, video):
        arr = np.asarray(video.numpy() if hasattr(video, "numpy") else video)
        return arr.astype(np.float32) / 255.0 * 2 - 1


class UCF101Dataset:
    """HDF5 + json index, 16-frame random windows, center crop
    (reference image_datasets.py:541-570)."""

    def __init__(self, h5path, config_path, image_size=64):
        import h5py
        import pandas as pd

        self.h5file = h5py.File(h5path, "r")
        self.dset = self.h5file["image"]
        self.conf = pd.read_json(config_path)
        self.ind = self.conf.index.tolist()
        self.n_frames = 16
        self.img_size = image_size
        self.is_test = False

    def set_test(self):
        self.is_test = True

    def __len__(self):
        return len(self.conf)

    def _crop_center(self, x):
        # x: (T, C, H, W) uint8 as stored by datasets/convert_ucf101.py
        if self.img_size == 64:
            x = x[:, :, :, 10 : 10 + self.img_size]
        elif self.img_size == 192:
            x = x[:, :, :, 32 : 32 + self.img_size]
        assert x.shape[2] == self.img_size and x.shape[3] == self.img_size
        return x

    def __getitem__(self, i):
        mov = self.conf.loc[self.ind[i]]
        length = mov.end - mov.start
        offset = (
            0
            if self.is_test or length <= self.n_frames
            else np.random.randint(length - self.n_frames)
        )
        x = self.dset[mov.start + offset : mov.start + offset + self.n_frames]
        x = self._crop_center(np.asarray(x))
        x = (x - 128.0) / 128.0
        return np.moveaxis(x, 1, -1).astype(np.float32), {}


class SyntheticVideoDataset:
    """Deterministic pseudo-random videos; lets tests and benchmarks run with
    nothing on disk. Moving-squares content so FVD-style metrics are not
    degenerate."""

    def __init__(self, T=100, image_size=64, n_videos=64, seed=0):
        self.T = T
        self.image_size = image_size
        self.n = n_videos
        self.seed = seed
        self.is_test = False

    def set_test(self):
        self.is_test = True

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        rng = np.random.default_rng(self.seed * 100003 + idx)
        T, S = self.T, self.image_size
        vid = np.zeros((T, S, S, 3), dtype=np.float32) - 1.0
        for _ in range(3):
            size = int(rng.integers(S // 8, S // 3))
            pos = rng.uniform(0, S - size, size=2)
            vel = rng.uniform(-2, 2, size=2)
            color = rng.uniform(-0.5, 1.0, size=3)
            for t in range(T):
                y, x = (pos + vel * t) % (S - size)
                vid[t, int(y) : int(y) + size, int(x) : int(x) + size] = color
        return vid, {}


class ImageDataset:
    """Image-folder dataset with class-from-filename labels
    (reference image_datasets.py:343-387)."""

    def __init__(self, resolution, image_paths, classes=None, shard=0, num_shards=1):
        self.resolution = resolution
        self.local_images = image_paths[shard:][::num_shards]
        self.local_classes = None if classes is None else classes[shard:][::num_shards]

    def __len__(self):
        return len(self.local_images)

    def __getitem__(self, idx):
        path = self.local_images[idx]
        pil_image = Image.open(path)
        pil_image.load()
        while min(*pil_image.size) >= 2 * self.resolution:
            pil_image = pil_image.resize(
                tuple(x // 2 for x in pil_image.size), resample=Image.BOX
            )
        scale = self.resolution / min(*pil_image.size)
        pil_image = pil_image.resize(
            tuple(round(x * scale) for x in pil_image.size), resample=Image.BICUBIC
        )
        arr = np.array(pil_image.convert("RGB"))
        crop_y = (arr.shape[0] - self.resolution) // 2
        crop_x = (arr.shape[1] - self.resolution) // 2
        arr = arr[crop_y : crop_y + self.resolution, crop_x : crop_x + self.resolution]
        arr = arr.astype(np.float32) / 127.5 - 1
        out = {}
        if self.local_classes is not None:
            out["y"] = np.array(self.local_classes[idx], dtype=np.int64)
        return arr, out  # (H, W, C) channels-last


def _list_image_files_recursively(data_dir):
    results = []
    for entry in sorted(os.listdir(data_dir)):
        full_path = os.path.join(data_dir, entry)
        ext = entry.split(".")[-1]
        if "." in entry and ext.lower() in ["jpg", "jpeg", "png", "gif"]:
            results.append(full_path)
        elif os.path.isdir(full_path):
            results.extend(_list_image_files_recursively(full_path))
    return results


# --------------------------------------------------------------------- #
# loaders
# --------------------------------------------------------------------- #


def _shard_info():
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class _BatchLoader:
    """Infinite batch generator with a background prefetch thread — the
    stand-in for torch DataLoader workers (1-CPU-friendly)."""

    def __init__(self, dataset, batch_size, shuffle=True, seed=0, prefetch=2,
                 drop_last=True):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.rng = np.random.default_rng(seed)
        self.q = queue.Queue(maxsize=prefetch)
        self.drop_last = drop_last
        t = threading.Thread(target=self._worker, daemon=True)
        t.start()

    def _epoch_indices(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        return idx

    def _worker(self):
        while True:
            idx = self._epoch_indices()
            n = len(idx) // self.batch_size * self.batch_size
            if n == 0 and not self.drop_last:
                n = len(idx)
            for i in range(0, n, self.batch_size):
                sel = idx[i : i + self.batch_size]
                items = [self.dataset[j] for j in sel]
                batch = np.stack([it[0] for it in items])
                kwargs = {}
                if items[0][1]:
                    kwargs = {
                        k: np.stack([it[1][k] for it in items])
                        for k in items[0][1]
                    }
                self.q.put((batch, kwargs))

    def __iter__(self):
        return self

    def __next__(self):
        return self.q.get()


def _make_train_dataset(dataset_name, data_path, T, image_size, shard, num_shards):
    if dataset_name == "minerl":
        return MineRLDataset(
            os.path.join(data_path, "train"), T=T, image_size=image_size
        )
    if dataset_name == "mazes_cwvae":
        return GQNMazesDataset(
            os.path.join(data_path, "train"), T=T, image_size=image_size
        )
    if dataset_name == "ucf101":
        return UCF101Dataset(
            h5path=os.path.join(data_path, "train.h5"),
            config_path=os.path.join(data_path, "train.json"),
            image_size=image_size,
        )
    if dataset_name == "bair_pushing":
        return BairPushingDataset(
            train=True, path=os.path.join(data_path, "train"),
            shard=shard, num_shards=num_shards, image_size=image_size, T=T,
        )
    if dataset_name in (
        "carla_no_traffic",
        "carla_with_traffic",
        "carla_town02_no_traffic",
    ):
        return CarlaDataset(
            train=True, path=data_path, shard=shard, num_shards=num_shards,
            image_size=image_size, T=T,
        )
    if dataset_name in ("bouncy_balls", "bouncy_balls_64"):
        return TensorVideoDataset(
            os.path.join(data_path, "train.pt"), shard=shard, num_shards=num_shards
        )
    if dataset_name == "synthetic":
        return SyntheticVideoDataset(T=T, image_size=image_size)
    raise Exception("no dataset", dataset_name)


def load_video_data(
    dataset_name,
    batch_size,
    T=None,
    image_size=None,
    deterministic=False,
    num_workers=1,
    data_path=None,
    seed=0,
):
    """Infinite generator of (batch (B,T,H,W,C) f32 [-1,1], kwargs) with
    per-process sharding (reference image_datasets.py:133-233)."""
    del num_workers
    if data_path is None:
        data_path = video_data_paths_dict[dataset_name]
    T = default_T_dict[dataset_name] if T is None else T
    image_size = (
        default_image_size_dict[dataset_name] if image_size is None else image_size
    )
    data_path = _data_root(data_path)
    shard, num_shards = _shard_info()
    dataset = _make_train_dataset(
        dataset_name, data_path, T, image_size, shard, num_shards
    )
    loader = _BatchLoader(
        dataset, batch_size, shuffle=not deterministic, seed=seed + shard
    )
    while True:
        yield next(loader)


def load_data(*, data_dir, batch_size, image_size, class_cond=False,
              deterministic=False, seed=0):
    """Image-folder generator (reference image_datasets.py:75-130).
    Yields ((B,H,W,C) f32, kwargs)."""
    if not data_dir:
        raise ValueError("unspecified data directory")
    all_files = _list_image_files_recursively(data_dir)
    classes = None
    if class_cond:
        class_names = [os.path.basename(path).split("_")[0] for path in all_files]
        sorted_classes = {x: i for i, x in enumerate(sorted(set(class_names)))}
        classes = [sorted_classes[x] for x in class_names]
    shard, num_shards = _shard_info()
    dataset = ImageDataset(
        image_size, all_files, classes=classes, shard=shard, num_shards=num_shards
    )
    loader = _BatchLoader(dataset, batch_size, shuffle=not deterministic, seed=seed)
    while True:
        yield next(loader)


def get_test_dataset(dataset_name, T=None, image_size=None):
    """Full-length test split (reference image_datasets.py:235-295)."""
    data_path = _data_root(video_data_paths_dict[dataset_name])
    T = default_T_dict[dataset_name] if T is None else T
    image_size = (
        default_image_size_dict[dataset_name] if image_size is None else image_size
    )
    if dataset_name == "minerl":
        ds = MineRLDataset(os.path.join(data_path, "test"), T=T, image_size=image_size)
    elif dataset_name == "mazes_cwvae":
        ds = GQNMazesDataset(
            os.path.join(data_path, "test"), T=T, image_size=image_size
        )
    elif dataset_name == "bair_pushing":
        ds = BairPushingDataset(
            train=False, path=os.path.join(data_path, "test"),
            image_size=image_size, T=T,
        )
    elif dataset_name in (
        "carla_no_traffic",
        "carla_with_traffic",
        "carla_town02_no_traffic",
    ):
        ds = CarlaDataset(train=False, path=data_path, image_size=image_size, T=T)
    elif dataset_name in ("bouncy_balls", "bouncy_balls_64"):
        ds = TensorVideoDataset(os.path.join(data_path, "test.pt"))
    elif dataset_name == "ucf101":
        ds = UCF101Dataset(
            h5path=os.path.join(data_path, "test.h5"),
            config_path=os.path.join(data_path, "test.json"),
            image_size=image_size,
        )
    elif dataset_name == "synthetic":
        ds = SyntheticVideoDataset(T=T, image_size=image_size, seed=1)
    else:
        raise Exception("no dataset", dataset_name)
    if hasattr(ds, "set_test"):
        ds.set_test()
    return ds


def get_train_dataset(dataset_name, T=None, image_size=None):
    data_path = _data_root(video_data_paths_dict[dataset_name])
    T = default_T_dict[dataset_name] if T is None else T
    image_size = (
        default_image_size_dict[dataset_name] if image_size is None else image_size
    )
    return _make_train_dataset(dataset_name, data_path, T, image_size, 0, 1)


def get_variable_length_dataset(dataset_name, T):
    assert dataset_name == "carla_no_traffic"
    return CarlaVariableLengthDataset(T)
