"""Tests of the GQN-Mazes room-sequence probe's HSV machinery
(scripts/video_eval_room_seq_acc.py) against constructed ground truth:
real GQN-Mazes data is unobtainable in-sandbox, so the color conversion is
pinned to colorsys and the classifier to synthetic room/hallway videos
(reference scripts/video_eval_room_seq_acc.py:106-186 semantics)."""

import colorsys
import importlib.util
import os
import sys

import numpy as np

_spec = importlib.util.spec_from_file_location(
    "room_seq_acc",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "video_eval_room_seq_acc.py"),
)
room_seq_acc = importlib.util.module_from_spec(_spec)
sys.modules["room_seq_acc"] = room_seq_acc
_spec.loader.exec_module(room_seq_acc)


def test_rgb_to_hsv_matches_colorsys():
    rng = np.random.default_rng(0)
    rgb = rng.uniform(0, 1, size=(64, 3)).astype(np.float64)
    got = room_seq_acc.rgb_to_hsv(rgb)
    ref = np.array([colorsys.rgb_to_hsv(*px) for px in rgb])
    np.testing.assert_allclose(got, ref, atol=1e-6)


def _frame(color, res=16):
    f = np.zeros((res, res, 3), dtype=np.float32)
    f[:] = color
    return f


HALLWAY_GREEN = (0.2, 0.8, 0.25)  # hue ~0.35, sat ~0.7, val 0.8 -> "green"
ROOM_GREY = (0.5, 0.5, 0.5)       # zero saturation -> not green


def test_green_fraction_thresholds():
    video = np.stack([
        _frame(ROOM_GREY),
        _frame(HALLWAY_GREEN),
        # green hue but too dark (v <= 0.2): must not count
        _frame((0.05, 0.15, 0.06)),
        # saturated but blue hue: must not count
        _frame((0.1, 0.1, 0.9)),
    ])
    frac = room_seq_acc.green_fraction(video)
    np.testing.assert_allclose(frac, [0.0, 1.0, 0.0, 0.0])


def test_classify_three_classes():
    room = _frame(ROOM_GREY)
    hall = _frame(HALLWAY_GREEN)
    T = 20
    # stays in a room the whole video
    assert room_seq_acc.classify(np.stack([room] * T)) == 0
    # enters the hallway and stays there to the end
    video = np.stack([room] * 10 + [hall] * 10)
    assert room_seq_acc.classify(video) == 1
    # enters the hallway then recovers into a room
    video = np.stack([room] * 5 + [hall] * 5 + [room] * 10)
    assert room_seq_acc.classify(video) == 2


def test_classify_enter_threshold():
    """A frame must exceed 5% green pixels to count as 'in hallway'."""
    mostly_room = _frame(ROOM_GREY)
    mostly_room[:2, :2] = HALLWAY_GREEN  # 4/256 pixels ~ 1.6% < 5%
    video = np.stack([mostly_room] * 10)
    assert room_seq_acc.classify(video) == 0
