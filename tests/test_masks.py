"""Mask-distribution tests: structural invariants for every distribution plus
statistical checks (the vectorized/numpy reimplementation is validated
distributionally, not bit-wise — SURVEY.md §7 hard parts)."""

import numpy as np
import pytest

from video_diffusion_tpu.training.masks import MaskSampler, make_interesting_masks

B, T, MAX_FRAMES = 8, 50, 10


def _batch(B=B, T=T):
    return np.zeros((B, T, 4, 4, 3), dtype=np.float32)


DISTS = [
    "autoregressive-5",
    "linspace-0-49-10",
    "linspace-no-obs-0-49-10",
    "uniform",
    "uniform-no-marg",
    "differently-spaced-groups",
    "one-group",
    "consecutive-groups",
]


@pytest.mark.parametrize("dist", DISTS)
def test_mask_invariants(dist, rng):
    ms = MaskSampler(dist, max_frames=MAX_FRAMES, pad_with_random_frames=True)
    batch, obs, latent, marg = ms.sample_all_masks(rng, _batch(), gather=False)
    for name, m in [("obs", obs), ("latent", latent), ("marg", marg)]:
        assert m.shape == (B, T, 1, 1, 1)
        assert set(np.unique(m)) <= {0.0, 1.0}, name
    total = obs + latent + marg
    assert total.max() <= 1.0, "masks must be disjoint"
    n_selected = total.reshape(B, T).sum(axis=1)
    assert (n_selected <= MAX_FRAMES).all()
    assert (latent.reshape(B, T).sum(axis=1) >= 1).all()


def test_no_marg_distributions_have_no_marg(rng):
    for dist in ["differently-spaced-groups-no-marg", "uniform-no-marg"]:
        T_eff = MAX_FRAMES if "differently" in dist else T
        ms = MaskSampler(dist, max_frames=MAX_FRAMES)
        _, obs, latent, marg = ms.sample_all_masks(rng, _batch(T=T_eff), gather=False)
        assert marg.sum() == 0


def test_autoregressive_contiguous(rng):
    ms = MaskSampler("autoregressive-4", max_frames=MAX_FRAMES)
    _, obs, latent, _ = ms.sample_all_masks(rng, _batch(), gather=False)
    for b in range(B):
        o = np.nonzero(obs[b].ravel())[0]
        l = np.nonzero(latent[b].ravel())[0]
        assert len(o) == 4 and len(l) == 6
        block = np.concatenate([o, l])
        assert (np.diff(block) == 1).all(), "autoregressive masks are contiguous"


def test_gather_correctness(rng):
    """Direct gather test with hand-built masks: real slots come from batch1
    at the selected (sorted) frame indices; pad slots from batch2 at random
    indices, carrying the source frames' mask values (train_util.py:379-403)."""
    ms = MaskSampler("differently-spaced-groups", max_frames=MAX_FRAMES)
    batch1 = np.random.randn(B, T, 4, 4, 3).astype(np.float32)
    batch2 = np.random.randn(B, T, 4, 4, 3).astype(np.float32)
    obs = np.zeros((B, T), dtype=np.float32)
    latent = np.zeros((B, T), dtype=np.float32)
    marg = np.zeros((B, T), dtype=np.float32)
    sel = {"obs": [3, 17], "latent": [5, 25, 40], "marg": [9]}
    obs[:, sel["obs"]] = 1
    latent[:, sel["latent"]] = 1
    marg[:, sel["marg"]] = 1
    x, fi, o, l, m = ms.gather_unmasked_elements(rng, batch1, batch2, obs, latent, marg)
    n_real = 6
    expected_fi = sorted(sel["obs"] + sel["latent"] + sel["marg"])
    for b in range(B):
        np.testing.assert_array_equal(fi[b, :n_real], expected_fi)
        np.testing.assert_array_equal(x[b, :n_real], batch1[b, expected_fi])
        # padding slots come from batch2 at the drawn random indices
        np.testing.assert_array_equal(x[b, n_real:], batch2[b, fi[b, n_real:]])
        # gathered masks follow the frame identity
        np.testing.assert_array_equal(
            o[b, :n_real, 0, 0, 0], obs[b, expected_fi]
        )
        np.testing.assert_array_equal(
            l[b, n_real:, 0, 0, 0], latent[b, fi[b, n_real:]]
        )


def test_gather_without_padding(rng):
    ms = MaskSampler(
        "differently-spaced-groups", max_frames=MAX_FRAMES,
        pad_with_random_frames=False,
    )
    batch1 = np.random.randn(B, T, 4, 4, 3).astype(np.float32)
    x, fi, obs, latent, marg = ms.sample_all_masks(rng, batch1, None)
    anything = (obs + latent + marg).reshape(len(x), -1)
    assert x.shape[1] == int(anything.sum(axis=1).max())


def test_uniform_distribution_statistics(rng):
    """uniform: every frame index equally likely to be selected."""
    ms = MaskSampler("uniform", max_frames=MAX_FRAMES)
    counts = np.zeros(T)
    for _ in range(40):
        _, obs, latent, _ = ms.sample_all_masks(rng, _batch(), gather=False)
        counts += (obs + latent).reshape(B, T).sum(axis=0)
    freq = counts / counts.sum()
    assert freq.max() < 5 / T, "selection should be near-uniform over frames"


def test_set_masks_override(rng):
    ms = MaskSampler("differently-spaced-groups", max_frames=MAX_FRAMES)
    set_masks = make_interesting_masks((B, T), MAX_FRAMES, n_interesting_masks=3)
    _, fi, obs, latent, marg = ms.sample_all_masks(
        rng, _batch(), None, set_masks=set_masks
    )
    # the first n_masks rows follow the preset geometric spacings
    for i in range(3):
        row_obs = set_masks["obs"][i]
        sel = np.nonzero(row_obs)[0]
        n_real = int((obs + latent + marg)[i].sum())
        assert set(sel) <= set(fi[i, :n_real].tolist())


def test_interesting_masks_structure():
    masks = make_interesting_masks((4, 100), max_frames=12, n_interesting_masks=3)
    n_obs = 12 // 3
    for i in range(3):
        assert masks["obs"][i].sum() == n_obs
        assert masks["latent"][i].sum() == 12 - n_obs
        assert (masks["obs"][i] * masks["latent"][i]).sum() == 0
