"""Property tests of every inference strategy: exactly the invariants the
reference asserts at runtime (inference_util.py:104-120) plus termination and
coverage."""

import numpy as np
import pytest

from video_diffusion_tpu.sampling.strategies import inference_strategies
from video_diffusion_tpu.sampling.sampler import compile_schedule

ADAPTIVE = [k for k in inference_strategies if "adaptive" in k]
FOR_VIS = [k for k in inference_strategies if "for-vis" in k]
NON_ADAPTIVE = [
    k for k in inference_strategies if k not in ADAPTIVE and k not in FOR_VIS
]
# every registry entry is invariant-tested by exactly one of the three
# parametrizations below (reference inference_util.py:779-799 has 20 entries)
assert sorted(ADAPTIVE + FOR_VIS + NON_ADAPTIVE) == sorted(inference_strategies)


def _make(mode, video_length=100, num_obs=36, max_frames=16, step_size=4):
    kwargs = dict(
        video_length=video_length,
        num_obs=num_obs,
        max_frames=max_frames,
        step_size=step_size,
    )
    if mode == "google":
        kwargs.pop("max_frames")
        kwargs.pop("step_size")
        kwargs["video_length"] = 100
    if mode == "ho-et-al-for-vis":
        kwargs["video_length"] = 64
    return inference_strategies[mode](**kwargs)


@pytest.mark.parametrize("mode", NON_ADAPTIVE)
def test_strategy_invariants(mode):
    s = _make(mode)
    done = set(s._done_frames)  # goal-directed modes pin extra frames as done
    n_steps = 0
    for obs, latent in s:
        n_steps += 1
        assert n_steps < 1000, "strategy failed to terminate"
        assert len(obs) + len(latent) <= s._max_frames
        assert len(latent) > 0
        for i in obs:
            assert i in done, f"{mode}: conditioned on ungenerated frame {i}"
        assert all(0 <= i < s._video_length for i in latent)
        done.update(latent)
    # full coverage (GoogleFS4's is_done stops within 4 frames of the end
    # before the FS1 pass fills in; the combined 'google' covers everything)
    assert len(done) >= s._video_length - (0 if mode != "google" else 0)
    assert done == set(range(s._video_length))


@pytest.mark.parametrize("mode", NON_ADAPTIVE)
def test_strategy_unconditional_bootstrap(mode):
    if mode in ("google", "ho-et-al-for-vis"):
        pytest.skip("needs specific shapes / conditional start")
    s = _make(mode, num_obs=0)
    obs, latent = next(iter(s))
    assert obs == []
    assert len(latent) == s._max_frames


@pytest.mark.parametrize("mode", ADAPTIVE)
def test_adaptive_strategy_invariants(mode):
    """Adaptive modes yield per-batch-element obs lists; the reference's
    runtime invariants (inference_util.py:108-112, 201-205) must hold for
    every element: condition only on generated frames, done set monotone,
    termination, full coverage."""
    B, T = 2, 100
    rng = np.random.default_rng(0)
    videos = rng.uniform(-1.0, 1.0, size=(B, T, 8, 8, 3)).astype(np.float32)
    s = inference_strategies[mode](
        distance="l2", video_length=T, num_obs=36, max_frames=16, step_size=4
    )
    s.set_videos(videos)
    done = set(s._done_frames)
    n_steps = 0
    for obs, latent in s:
        n_steps += 1
        assert n_steps < 1000, "strategy failed to terminate"
        # per-batch-element lists, latents shared across the batch
        assert len(obs) == B and len(latent) == B
        lat = latent[0]
        assert all(l == lat for l in latent)
        assert len(lat) > 0
        for b in range(B):
            assert len(obs[b]) + len(lat) <= s._max_frames
            for i in obs[b]:
                assert i in done, f"{mode}: conditioned on ungenerated frame {i}"
        assert all(0 <= i < T for i in lat)
        done.update(lat)
    assert done == set(range(T))


@pytest.mark.parametrize("mode", ADAPTIVE)
def test_adaptive_unconditional_bootstrap(mode):
    B, T = 3, 40
    videos = np.zeros((B, T, 4, 4, 3), dtype=np.float32)
    s = inference_strategies[mode](
        distance="l2", video_length=T, num_obs=0, max_frames=8, step_size=2
    )
    s.set_videos(videos)
    obs, latent = next(iter(s))
    assert obs == [[]] * B
    assert len(latent) == B and len(latent[0]) == s._max_frames


def test_adaptive_autoreg_selects_distinct_obs_per_element():
    """The greedy max-min-distance pick depends on content: elements with
    different content may choose different observation sets."""
    B, T = 2, 30
    rng = np.random.default_rng(1)
    videos = rng.uniform(-1.0, 1.0, size=(B, T, 8, 8, 1)).astype(np.float32)
    # element 1: all generated frames identical -> picks are degenerate
    videos[1] = videos[1, :1]
    s = inference_strategies["adaptive-autoreg"](
        distance="l2", video_length=T, num_obs=10, max_frames=8, step_size=2
    )
    s.set_videos(videos)
    obs, latent = next(iter(s))
    assert len(obs) == B
    # always_selected=(0,): both start from the most recent frame
    assert obs[0][0] == obs[1][0] == 9
    assert sorted(set(obs[0])) == sorted(obs[0]), "no duplicate obs"


def test_adaptive_lpips_embedder_path():
    """The 'lpips' distance routes through eval.lpips.LpipsEmbedder (random
    weights in-sandbox); one tiny smoke iteration to pin the wiring."""
    B, T = 1, 16
    rng = np.random.default_rng(2)
    videos = rng.uniform(-1.0, 1.0, size=(B, T, 8, 8, 3)).astype(np.float32)
    s = inference_strategies["adaptive-autoreg"](
        distance="lpips", video_length=T, num_obs=6, max_frames=6, step_size=3
    )
    s.set_videos(videos)
    obs, latent = next(iter(s))
    assert len(obs[0]) == 3 and all(i < 6 for i in obs[0])


def test_ho_et_al_for_vis_protocol():
    """Fixed 64-frame visualisation protocol (inference_util.py:596-612):
    unconditional linspace bootstrap then sequential 9-frame infill windows,
    with the 64-overflow frame swapped for obs frame 55."""
    s = inference_strategies["ho-et-al-for-vis"](
        video_length=64, num_obs=0, max_frames=16, step_size=4
    )
    done = set()
    n_steps = 0
    first = True
    for obs, latent in s:
        n_steps += 1
        assert n_steps < 200
        if first:
            # base-class bootstrap (num_obs=0, step 0) yields range(max_frames)
            # exactly as the reference does (inference_util.py:85-90) — the
            # linspace branch inside next_indices is only directly reachable
            assert obs == []
            assert latent == list(range(16))
            first = False
        else:
            assert len(obs) + len(latent) <= 16
            for i in obs:
                assert i in done, f"conditioned on ungenerated frame {i}"
        assert all(0 <= i < 64 for i in latent)
        done.update(latent)
    assert done == set(range(64))
    # the linspace schedule in next_indices (reference :598-602) — reachable
    # only when _done_frames is empty, which the base bootstrap pre-empts
    s2 = inference_strategies["ho-et-al-for-vis"](
        video_length=64, num_obs=0, max_frames=16, step_size=4
    )
    obs, latent = s2.next_indices()
    assert obs == [] and latent == [int(i) for i in np.linspace(0, 60, 16)]


def test_baby_cond_ho_et_al_for_vis_protocol():
    """Fixed 7-step schedule (inference_util.py:585-593). The custom __iter__
    bypasses the base __next__ bookkeeping, so done-frame tracking is the
    caller's: with the first 10 frames observed, every conditioned frame is
    either observed or previously generated and frames 10..29 get covered."""
    s = inference_strategies["baby-cond-ho-et-al-for-vis"](
        video_length=30, num_obs=10, max_frames=7, step_size=3
    )
    done = set(range(10))
    steps = list(s)
    assert len(steps) == 7
    for obs, latent in steps:
        assert len(obs) + len(latent) <= 7
        for i in obs:
            assert i in done, f"conditioned on ungenerated frame {i}"
        assert all(0 <= i < 30 for i in latent)
        done.update(latent)
    assert done == set(range(30))


def test_autoreg_shape():
    s = inference_strategies["autoreg"](
        video_length=20, num_obs=4, max_frames=6, step_size=2
    )
    steps = list(s)
    assert steps[0] == ([0, 1, 2, 3], [4, 5])
    assert steps[1] == ([2, 3, 4, 5], [6, 7])
    assert steps[-1][1][-1] == 19


def test_independent_uses_only_original_obs():
    s = inference_strategies["independent"](
        video_length=30, num_obs=4, max_frames=6, step_size=2
    )
    for obs, latent in s:
        assert set(obs) <= {0, 1, 2, 3}


def test_exp_past_distances():
    s = inference_strategies["exp-past"](
        video_length=64, num_obs=32, max_frames=8, step_size=1
    )
    obs, latent = next(iter(s))
    assert latent == [32]
    # exponential distances into the past present
    assert 31 in obs and 30 in obs and 28 in obs and 24 in obs and 16 in obs


def test_hierarchy_two_levels_coarse_then_fine():
    s = inference_strategies["hierarchy-2"](
        video_length=100, num_obs=10, max_frames=16, step_size=8
    )
    steps = list(s)
    first_latents = steps[0][1]
    # first step: coarse grid spanning the whole remaining video
    assert max(first_latents) >= 95
    assert min(first_latents) >= 10


def test_google_cascade_phases():
    s = inference_strategies["google"](video_length=100, num_obs=36)
    phases = []
    for obs, latent in s:
        phases.append(s._active_iterator)
        if s._active_iterator == "fs4":
            assert all(i % 4 == latent[0] % 4 for i in latent)
    assert "fs4" in phases and "fs1" in phases


def test_optimal_schedule_override(tmp_path):
    import pickle

    sched = {0: [0, 2], 1: [1, 3]}
    p = tmp_path / "optimal_schedule.pt"
    with open(p, "wb") as f:
        pickle.dump(sched, f)
    s = inference_strategies["autoreg"](
        video_length=12, num_obs=4, max_frames=6, step_size=2,
        optimal_schedule_path=str(p),
    )
    steps = list(s)
    assert steps[0][0] == [0, 2]
    assert steps[1][0] == [1, 3]


def test_compile_schedule_tables():
    s = inference_strategies["autoreg"](
        video_length=12, num_obs=2, max_frames=4, step_size=2
    )
    sched = compile_schedule(iter(s), max_frames=4, video_length=12)
    assert sched.num_steps == 5
    seg = sched.segments[0]
    # step 0: obs [0,1], latent [2,3]
    np.testing.assert_array_equal(seg.frame_indices[0], [0, 1, 2, 3])
    np.testing.assert_array_equal(seg.obs_mask[0], [1, 1, 0, 0])
    np.testing.assert_array_equal(seg.latent_mask[0], [0, 0, 1, 1])
    np.testing.assert_array_equal(seg.scatter_indices[0], [12, 12, 2, 3])
    # every frame is scattered exactly once across all segments
    written = np.concatenate(
        [g.scatter_indices[g.scatter_indices < 12] for g in sched.segments]
    )
    assert sorted(written.tolist()) == list(range(2, 12))
    # flat steps view matches the strategy replay
    s2 = inference_strategies["autoreg"](
        video_length=12, num_obs=2, max_frames=4, step_size=2
    )
    assert sched.steps == [(list(o), list(l)) for o, l in s2]


def test_compile_schedule_segments_by_width():
    """Windows of different widths land in separate segments (no padding)."""
    s = inference_strategies["autoreg"](
        video_length=13, num_obs=0, max_frames=5, step_size=2
    )
    sched = compile_schedule(iter(s), max_frames=5, video_length=13)
    widths = [seg.frame_indices.shape[1] for seg in sched.segments]
    # bootstrap window is 5 latents; steady state is 3 obs + 2 latent = 5;
    # the very last step may be narrower
    assert all(w <= 5 for w in widths)
    for seg in sched.segments:
        # within a segment the width is constant and every row is full
        assert (seg.obs_mask + seg.latent_mask == 1).all()
