"""CARLA data generation by driving a remote simulator (reference
scripts/carla.py:37-171): drives the InvertedAI CARLA environment over ZMQ,
saving 1000-frame videos as video_<i>.pt (uint8 T x H x W x C) plus
coords_<i>.npy / actions_<i>.npy. Requires a reachable simulator endpoint
(zmq) — gated at runtime."""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--endpoint", default="tcp://localhost:5555")
    parser.add_argument("--out_dir", default="datasets/carla/no-traffic")
    parser.add_argument("--n_videos", type=int, default=100)
    parser.add_argument("--T", type=int, default=1000)
    parser.add_argument("--image_size", type=int, default=128)
    parser.add_argument("--start_index", type=int, default=0)
    args = parser.parse_args()

    try:
        import zmq
    except ImportError as e:
        raise SystemExit(
            "CARLA data generation needs pyzmq and a running simulator "
            "endpoint; this environment has neither. Converted CARLA data "
            "(video_*.pt + video_train/test.csv) is consumed directly by the "
            "loaders."
        ) from e
    import torch

    os.makedirs(args.out_dir, exist_ok=True)
    ctx = zmq.Context()
    sock = ctx.socket(zmq.REQ)
    sock.connect(args.endpoint)

    for vid in range(args.start_index, args.start_index + args.n_videos):
        out_path = os.path.join(args.out_dir, f"video_{vid}.pt")
        if os.path.exists(out_path):
            continue
        sock.send_json({"cmd": "reset", "image_size": args.image_size})
        obs = sock.recv_pyobj()
        frames, coords, actions = [], [], []
        for t in range(args.T):
            sock.send_json({"cmd": "autopilot_step"})
            obs = sock.recv_pyobj()
            frames.append(np.asarray(obs["image"], dtype=np.uint8))
            coords.append(obs.get("ego_coords", [0.0, 0.0]))
            actions.append(obs.get("action", [0.0, 0.0, 0.0]))
        torch.save(torch.from_numpy(np.stack(frames)), out_path)
        np.save(os.path.join(args.out_dir, f"coords_{vid}.npy"), np.asarray(coords))
        np.save(os.path.join(args.out_dir, f"actions_{vid}.npy"), np.asarray(actions))
        print(f"saved {out_path}")


if __name__ == "__main__":
    main()
