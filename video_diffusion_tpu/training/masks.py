"""Training-time frame-mask sampling.

Host-side numpy reimplementation of the reference's mask machinery
(/root/reference/improved_diffusion/train_util.py:231-403). This is
TPU-idiomatic placement: the ragged/recursive sampling logic runs in the
(prefetched, async) input pipeline, and the device only ever sees
static-shaped (B, max_frames, ...) tensors plus masks.

Distributions are equivalent to the reference's (validated statistically in
tests/test_masks.py), not bit-identical — the reference mixes torch and numpy
RNG streams.

Batches are channels-last: (B, T, H, W, C).
"""

from typing import Optional

import numpy as np


class MaskSampler:
    """Samples observed/latent/kinda-marginal masks over T frames and gathers
    the chosen ≤ max_frames frames into a dense window.

    :param mask_distribution: one of
        'autoregressive-<k>', 'linspace-<low>-<high>-<n>',
        'linspace-no-obs-<low>-<high>-<n>', 'uniform', 'uniform-no-marg',
        'differently-spaced-groups', 'differently-spaced-groups-no-marg',
        'one-group', 'consecutive-groups'.
    """

    def __init__(
        self,
        mask_distribution: str = "differently-spaced-groups",
        max_frames: int = 10,
        pad_with_random_frames: bool = True,
        do_inefficient_marg: bool = True,
    ):
        self.mask_distribution = mask_distribution
        self.max_frames = max_frames
        self.pad_with_random_frames = pad_with_random_frames
        self.p_observed_latent_marg = (
            np.array([0.33, 0.33, 0.33])
            if do_inefficient_marg
            else np.array([0.5, 0.5, 0.0])
        )

    # -- reference train_util.py:231-255 ---------------------------------- #
    def sample_some_indices(self, rng: np.random.Generator, max_indices: int, T: int):
        s = int(rng.integers(1, max_indices + 1))
        max_scale = T / (s - 0.999)
        if (
            self.mask_distribution
            in (
                "one-group",
                "differently-spaced-groups",
                "differently-spaced-groups-no-marg",
            )
            or "linspace" in self.mask_distribution
        ):
            scale = np.exp(rng.random() * np.log(max_scale))
        elif self.mask_distribution == "consecutive-groups":
            scale = 1
        else:
            raise NotImplementedError(self.mask_distribution)
        pos = rng.random() * (T - scale * (s - 1))
        indices = [int(pos + i * scale) for i in range(s)]
        if all(0 <= i < T for i in indices):
            return indices
        return self.sample_some_indices(rng, max_indices, T)

    # -- reference train_util.py:257-377 ---------------------------------- #
    def _sample_row(self, rng, obs_row, latent_row, marg_row, T):
        N = self.max_frames
        dist = self.mask_distribution
        if "autoregressive" in dist:
            n_obs = int(dist.split("-")[1])
            n_latent = N - n_obs
            start_i = int(rng.integers(0, T - N + 1))
            obs_row[start_i : start_i + n_obs] = 1.0
            latent_row[start_i + n_obs : start_i + n_obs + n_latent] = 1.0
        elif "linspace-no-obs" in dist:
            low, high, n = map(int, dist.split("-")[-3:])
            indices = np.linspace(low, high, n).astype(np.int64)
            latent_row[indices] = 1.0
        elif "linspace" in dist:
            low, high, n = map(int, dist.split("-")[1:])
            indices = np.linspace(low, high, n).astype(np.int64)
            latent_row[indices] = 1.0
            while rng.random() > 0.5 and N - obs_row.sum() > 1:
                index_indices = np.array(
                    self.sample_some_indices(
                        rng, max_indices=int(N - obs_row.sum()) - 1, T=N
                    ),
                    dtype=np.int64,
                )
                obs_row[indices[index_indices]] = 1.0
                latent_row[indices[index_indices]] = 0.0
        elif dist == "uniform":
            n_frames = int(rng.integers(1, N))
            n_obs = int(rng.integers(0, n_frames))
            indices = rng.choice(T, size=n_frames, replace=False)
            obs_row[indices[:n_obs]] = 1.0
            latent_row[indices[n_obs:]] = 1.0
        elif dist == "uniform-no-marg":
            n_frames = N
            n_obs = int(rng.integers(0, n_frames))
            indices = rng.choice(T, size=n_frames, replace=False)
            obs_row[indices[:n_obs]] = 1.0
            latent_row[indices[n_obs:]] = 1.0
        elif dist == "differently-spaced-groups-no-marg":
            assert N == T
            while rng.random() > 0.5 and N - obs_row.sum() > 1:
                indices = self.sample_some_indices(
                    rng, max_indices=int(N - obs_row.sum()) - 1, T=T
                )
                obs_row[indices] = 1.0
            latent_row += 1 - obs_row
        elif dist == "one-group":
            indices = self.sample_some_indices(rng, max_indices=N, T=T)
            n_obs = int(rng.integers(0, len(indices)))
            obs_indices = rng.choice(indices, size=n_obs)
            obs_row[obs_indices] = 1.0
            latent_indices = np.setdiff1d(indices, obs_indices)
            latent_row[latent_indices] = 1.0
        elif "groups" in dist:
            latent_row[self.sample_some_indices(rng, max_indices=N, T=T)] = 1.0
            while True:
                mask_i = rng.choice(3, p=self.p_observed_latent_marg / self.p_observed_latent_marg.sum())
                mask = [obs_row, latent_row, marg_row][mask_i]
                indices = np.array(
                    self.sample_some_indices(rng, max_indices=N, T=T), dtype=np.int64
                )
                taken = (obs_row + latent_row + marg_row)[indices]
                indices = indices[taken == 0]
                if len(indices) > N - obs_row.sum() - latent_row.sum() - marg_row.sum():
                    break
                mask[indices] = 1.0
        else:
            raise NotImplementedError(dist)

    def sample_all_masks(
        self,
        rng: np.random.Generator,
        batch1: np.ndarray,
        batch2: Optional[np.ndarray] = None,
        gather: bool = True,
        set_masks: Optional[dict] = None,
    ):
        """Draw per-video masks; optionally gather the selected frames into a
        dense (B, max_frames, H, W, C) window with frame_indices.

        Returns (batch, frame_indices, obs_mask, latent_mask, kinda_marg_mask)
        when gather=True, else (batch1, obs_mask, latent_mask, kinda_marg_mask)
        with full-length (B, T, 1, 1, 1) masks.
        """
        B, T = batch1.shape[:2]
        obs = np.zeros((B, T), dtype=np.float32)
        latent = np.zeros((B, T), dtype=np.float32)
        marg = np.zeros((B, T), dtype=np.float32)
        for b in range(B):
            self._sample_row(rng, obs[b], latent[b], marg[b], T)
        if set_masks and len(set_masks.get("obs", ())) > 0:
            for key, arr in (("obs", obs), ("latent", latent), ("kinda_marg", marg)):
                vals = np.asarray(set_masks[key]).reshape(len(set_masks[key]), T)
                n_set = min(len(vals), B)
                arr[:n_set] = vals[:n_set]
        if not gather:
            e = (1, 1, 1)
            return (
                batch1,
                obs.reshape(B, T, *e),
                latent.reshape(B, T, *e),
                marg.reshape(B, T, *e),
            )
        return self.gather_unmasked_elements(rng, batch1, batch2, obs, latent, marg)

    # -- reference train_util.py:379-403 ---------------------------------- #
    def gather_unmasked_elements(self, rng, batch1, batch2, obs, latent, marg):
        B, T = obs.shape
        represented = np.clip(obs + latent + marg, a_min=None, a_max=1)
        if self.pad_with_random_frames:
            effective_T = self.max_frames
        else:
            effective_T = int(represented.sum(axis=1).max())
        new_batch = np.zeros(
            (B, effective_T) + batch1.shape[2:], dtype=batch1.dtype
        )
        indices = np.zeros((B, effective_T), dtype=np.int64)
        new_masks = [np.zeros((B, effective_T), dtype=np.float32) for _ in range(3)]
        masks = [obs, latent, marg]
        src = batch1 if batch2 is None else batch2
        for b in range(B):
            nz = np.nonzero(represented[b])[0]
            n = len(nz)
            indices[b, :n] = nz
            if self.pad_with_random_frames:
                indices[b, n:] = rng.integers(0, T, size=effective_T - n)
            new_batch[b, :n] = batch1[b, nz]
            new_batch[b, n:] = src[b, indices[b, n:]]
            for new_m, m in zip(new_masks, masks):
                new_m[b, :n] = m[b, nz]
                new_m[b, n:] = m[b, indices[b, n:]]
        e = (1, 1, 1)
        return (
            new_batch,
            indices.astype(np.int32),
            new_masks[0].reshape(B, effective_T, *e),
            new_masks[1].reshape(B, effective_T, *e),
            new_masks[2].reshape(B, effective_T, *e),
        )


def make_interesting_masks(batch_shape, max_frames, n_interesting_masks=3):
    """Geometric-spacing preset masks used for in-training sampling
    visualisation (reference train_util.py:610-630).

    :param batch_shape: (B, T, ...) of the validation batch.
    :return: dict of (n_masks, T) arrays.
    """
    B, T = batch_shape[:2]
    n_masks = min(n_interesting_masks, B)
    obs = np.zeros((n_masks, T), dtype=np.float32)
    latent = np.zeros((n_masks, T), dtype=np.float32)
    marg = np.zeros((n_masks, T), dtype=np.float32)
    n_obs = max_frames // 3
    for i in range(n_masks):
        spacing = (
            1
            if n_masks == 1
            else int((T // max_frames) ** (i / (n_masks - 1)))
        )
        spacing = max(spacing, 1)
        obs[i, : n_obs * spacing : spacing] = 1.0
        latent[i, n_obs * spacing : max_frames * spacing : spacing] = 1.0
    return {"obs": obs, "latent": latent, "kinda_marg": marg}
