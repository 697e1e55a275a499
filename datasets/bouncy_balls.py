"""Generate the bouncing-balls dataset: N x T x 1 x 32 x 32 float tensors in
[0, 1], saved as datasets/bouncing_balls_100/{train,test}.pt — the same
on-disk layout the reference's generator writes
(reference datasets/bouncy_balls.py, Sutskever RTRBM-style physics).

Self-contained numpy physics (elastic balls in a box) — no torch needed to
simulate; torch is used only for the .pt serialization the loaders expect.
"""

import argparse
import os

import numpy as np


def simulate(rng, T=100, n_balls=3, res=32, r=2.0, box=10.0, dt=0.5):
    """Positions of n_balls elastic balls in a [0, box]^2 box over T steps."""
    pos = rng.uniform(r, box - r, size=(n_balls, 2))
    vel = rng.normal(size=(n_balls, 2))
    vel /= np.linalg.norm(vel, axis=1, keepdims=True)
    traj = np.zeros((T, n_balls, 2))
    for t in range(T):
        traj[t] = pos
        pos = pos + vel * dt
        # wall bounces
        for d in range(2):
            low = pos[:, d] < r
            high = pos[:, d] > box - r
            vel[low | high, d] *= -1
            pos[:, d] = np.clip(pos[:, d], r, box - r)
        # pairwise elastic collisions (equal mass: swap normal components)
        for i in range(n_balls):
            for j in range(i + 1, n_balls):
                dvec = pos[i] - pos[j]
                dist = np.linalg.norm(dvec)
                if dist < 2 * r and dist > 1e-6:
                    n = dvec / dist
                    dv = vel[i] - vel[j]
                    comp = np.dot(dv, n)
                    if comp < 0:
                        vel[i] -= comp * n
                        vel[j] += comp * n
    return traj


def render(traj, res=32, r=2.0, box=10.0):
    """Soft-disc rendering of ball trajectories -> (T, 1, res, res) [0, 1]."""
    T, n_balls, _ = traj.shape
    grid = (np.arange(res) + 0.5) * (box / res)
    gx, gy = np.meshgrid(grid, grid, indexing="xy")
    out = np.zeros((T, 1, res, res), dtype=np.float32)
    for t in range(T):
        frame = np.zeros((res, res), dtype=np.float32)
        for b in range(n_balls):
            x, y = traj[t, b]
            d2 = (gx - x) ** 2 + (gy - y) ** 2
            frame += np.exp(-np.maximum(d2 - (r * 0.75) ** 2, 0) / (r * 0.35) ** 2)
        out[t, 0] = np.clip(frame, 0, 1)
    return out


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out_dir", default="datasets/bouncing_balls_100")
    parser.add_argument("--n_train", type=int, default=4000)
    parser.add_argument("--n_test", type=int, default=200)
    parser.add_argument("--T", type=int, default=100)
    parser.add_argument("--res", type=int, default=32)
    parser.add_argument("--n_balls", type=int, default=3)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--only_split", choices=["train", "test"], default=None,
        help="regenerate just one split (splits are independently seeded: "
        "seed for train, seed+1 for test, so enlarging one leaves the other "
        "untouched and keeps its existing prefix bit-identical)",
    )
    args = parser.parse_args()

    import torch

    os.makedirs(args.out_dir, exist_ok=True)
    for split, n in (("train", args.n_train), ("test", args.n_test)):
        if args.only_split and split != args.only_split:
            continue
        rng = np.random.default_rng(args.seed + (0 if split == "train" else 1))
        videos = np.zeros((n, args.T, 1, args.res, args.res), dtype=np.float32)
        for i in range(n):
            traj = simulate(rng, T=args.T, n_balls=args.n_balls, res=args.res)
            videos[i] = render(traj, res=args.res)
            if (i + 1) % 200 == 0:
                print(f"{split}: {i + 1}/{n}")
        path = os.path.join(args.out_dir, f"{split}.pt")
        torch.save(torch.from_numpy(videos), path)
        print(f"wrote {path} {videos.shape}")


if __name__ == "__main__":
    main()
