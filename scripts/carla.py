"""CARLA data generation by driving the InvertedAI simulator (reference
scripts/carla.py:37-171).

Behavioral surface matched to the reference:
* one process drives ONE trajectory of ``videos_per_trajectory`` x 1000
  frames with the simulator's expert action (``info['expert_action']``),
  under a per-step watchdog timeout and a global session timeout;
* every 1000 frames a chunk is saved: ``video_<i>.pt`` (uint8 T x H x W x C),
  ``video_<i>.mp4`` (when imageio is available), ``coords_<i>.npy``,
  ``actions_<i>.npy``, ``config_<i>.pkl`` (the sampled world parameters);
* runs are resumable: the next free trajectory index is discovered from the
  files on disk, stepping by ``videos_per_trajectory`` exactly like the
  reference's ``next_save_index`` (scripts/carla.py:128-133);
* world parameters (town, traffic count, pedestrian count, weather) are
  randomized per trajectory (scripts/carla.py:84-93).

The drive/capture loop is a plain function over a duck-typed env
(``step(action) -> (obs, reward, done, info)``) so it is unit-tested with a
fake env (tests/test_carla_datagen.py); only ``make_env`` needs the
``invertedai_simulate`` package and a reachable simulator, neither of which
exists in this sandbox — it raises a clear SystemExit instead.
"""

import argparse
import os
import pickle
import signal
import time

import numpy as np

VIDEO_LENGTH = 1000


class timeout:
    """SIGALRM-based timeout context (reference scripts/carla.py:19-33)."""

    def __init__(self, seconds=1, error_message="Timeout"):
        self.seconds = seconds
        self.error_message = error_message

    def _handle(self, signum, frame):
        raise TimeoutError(self.error_message)

    def __enter__(self):
        signal.signal(signal.SIGALRM, self._handle)
        signal.alarm(self.seconds)

    def __exit__(self, type, value, traceback):
        signal.alarm(0)


def sample_world_parameters(rng, max_traffic=200, max_pedestrian=200):
    """Random town/traffic/pedestrians/weather per trajectory
    (reference scripts/carla.py:84-93)."""
    return dict(
        carlatown=str(
            rng.choice(["Town01", "Town02", "Town03", "Town04"])
        ),
        traffic_count=int(rng.integers(0, max_traffic + 1)),
        pedestrian_count=int(rng.integers(0, max_pedestrian + 1)),
        weather="Random",
    )


def get_save_name(save_dir, index, mode="video", ext="pt"):
    return os.path.join(save_dir, f"{mode}_{index}.{ext}")


def next_save_index(save_dir, videos_per_trajectory):
    """First trajectory start index with no video on disk, stepping by
    videos_per_trajectory (reference scripts/carla.py:128-133) — lets
    parallel workers and restarts pick disjoint index ranges."""
    i = 0
    while os.path.exists(get_save_name(save_dir, i)):
        i += videos_per_trajectory
    return i


def save_chunk(save_dir, index, frames, world_parameters, fps=10):
    """Persist one 1000-frame chunk in the reference layout
    (scripts/carla.py:146-163)."""
    import torch

    video = torch.from_numpy(
        np.stack([np.asarray(f, dtype=np.uint8) for f in frames["images"]])
    )
    torch.save(video, get_save_name(save_dir, index, "video", "pt"))
    try:
        import imageio

        imageio.mimwrite(
            get_save_name(save_dir, index, "video", "mp4"),
            frames["images"], fps=fps, quality=7,
        )
    except Exception:
        pass  # mp4 preview is best-effort; the .pt is the dataset
    np.save(
        get_save_name(save_dir, index, "coords", "npy"),
        np.asarray(frames["coords"]),
    )
    np.save(
        get_save_name(save_dir, index, "actions", "npy"),
        np.asarray(frames["actions"]),
    )
    with open(get_save_name(save_dir, index, "config", "pkl"), "wb") as f:
        pickle.dump(world_parameters, f)


def drive_and_capture(
    env,
    info,
    save_dir,
    world_parameters,
    videos_per_trajectory=5,
    video_length=VIDEO_LENGTH,
    step_timeout=10,
    use_alarm=True,
):
    """Expert-action drive loop (reference scripts/carla.py:136-166): step the
    env with its own expert action, buffer frames/coords/actions, flush a
    chunk every ``video_length`` frames. Returns the number of chunks saved
    (a per-step TimeoutError aborts the trajectory, like the reference's
    exit())."""
    trajectory_index = next_save_index(save_dir, videos_per_trajectory)
    frames = {"images": [], "coords": [], "actions": []}
    saved = 0
    walltime = time.time()
    for i in range(video_length * videos_per_trajectory):
        try:
            guard = timeout(seconds=step_timeout) if use_alarm else None
            if guard:
                guard.__enter__()
            try:
                action = info["expert_action"]
                obs, reward, done, info = env.step(action)
                frames["images"].append(obs["sensor_data"]["front-cam"]["image"])
                frames["coords"].append(obs["compact_vector"])
                frames["actions"].append(action)
            finally:
                if guard:
                    guard.__exit__(None, None, None)
        except TimeoutError:
            print("\n\nTimed out!!!!!! Exiting.\n\n")
            return saved
        if (i + 1) % video_length == 0:
            save_index = trajectory_index + i // video_length
            save_chunk(save_dir, save_index, frames, world_parameters)
            frames = {"images": [], "coords": [], "actions": []}
            saved += 1
            print(
                f"generated {video_length} frames in "
                f"{time.time() - walltime} seconds"
            )
            walltime = time.time()
    return saved


def make_env(args, world_parameters):
    """Connect to the InvertedAI simulator (reference scripts/carla.py:60-111).
    Gated: the package and a reachable endpoint exist only on the original
    data-collection setup."""
    try:
        from invertedai_simulate.interface import IAIEnv
        from invertedai_simulate.utils import Resolution, SensorSettings
    except ImportError as e:
        raise SystemExit(
            "CARLA data generation needs the invertedai_simulate package and "
            "a reachable simulator endpoint; this environment has neither. "
            "Converted CARLA data (video_*.pt + video_train/test.csv) is "
            "consumed directly by the loaders."
        ) from e

    def_res = Resolution(args.res, args.res)
    sensors_dict = {
        "front-cam": {
            "sensor_type": "camera",
            "camera_type": "rgb-camera",
            "bounding_box": False,
            "track_actor_types": SensorSettings.Available_Tracked_Actors,
            "show_bounding_boxes": False,
            "world_sensor": False,
            "resolution": def_res,
            "location": SensorSettings.Location(x=2, z=2, y=0),
            "rotation": SensorSettings.Rotation(yaw=0, roll=0, pitch=0),
            "fov": 120.0,
        },
    }
    fake_parser = argparse.ArgumentParser()
    IAIEnv.add_config(fake_parser)
    config = fake_parser.parse_args(
        ["--client_id", "mycompany", "--enable_progress_spinner", "0"]
    )
    config.zmq_server_address = f"{args.server_ip}:{args.port}"
    env = IAIEnv(config)
    env.set_scenario(
        "egodriving", world_parameters=world_parameters, sensors=sensors_dict
    )
    obs, reward, done, info = env.step([0.0, 0.0])
    return env, info


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "save_dir", type=str, help="Where to save the generated videos/coords."
    )
    parser.add_argument("--server_ip", default="simulate.inverted.ai")
    parser.add_argument(
        "--port", type=int, default=5555,
        help="5555 is the server with other cars.",
    )
    parser.add_argument("--max_traffic", type=int, default=200)
    parser.add_argument("--max_pedestrian", type=int, default=200)
    parser.add_argument("--res", type=int, default=512)
    parser.add_argument("--videos_per_trajectory", type=int, default=5)
    parser.add_argument("--session_timeout", type=int, default=1800)
    args = parser.parse_args()

    os.makedirs(args.save_dir, exist_ok=True)
    rng = np.random.default_rng()
    world_parameters = sample_world_parameters(
        rng, args.max_traffic, args.max_pedestrian
    )
    with timeout(seconds=args.session_timeout):
        env, info = make_env(args, world_parameters)
    drive_and_capture(
        env, info, args.save_dir, world_parameters,
        videos_per_trajectory=args.videos_per_trajectory,
    )
    with timeout(600):
        print(env.end_simulation())
        env.close()


if __name__ == "__main__":
    main()
