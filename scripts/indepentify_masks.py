"""Reshape saved mask indices into per-step-independent form
(reference scripts/indepentify_masks.py): every latent frame becomes its own
single-frame step conditioned on the same observations."""

import argparse
import pickle

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("path", type=str,
                        help="pickle of (obs_indices_list, latent_indices_list)")
    parser.add_argument("--out", type=str, required=True)
    args = parser.parse_args()
    with open(args.path, "rb") as f:
        obs_list, lat_list = pickle.load(f)
    new_obs, new_lat = [], []
    for obs, lats in zip(obs_list, lat_list):
        flat_lats = lats[0] if (lats and isinstance(lats[0], list)) else lats
        flat_obs = obs[0] if (obs and isinstance(obs[0], list)) else obs
        for l in flat_lats:
            new_obs.append(list(flat_obs))
            new_lat.append([l])
    with open(args.out, "wb") as f:
        pickle.dump((new_obs, new_lat), f)
    print(f"wrote {args.out}: {len(new_lat)} independent steps")
