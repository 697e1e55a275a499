"""Offline converter: torch `lpips` package weights -> our Flax pickle.

Run once in any environment with torch + lpips installed:

    python scripts/convert_lpips_weights.py --out lpips_alex.pkl

then point LPIPS_WEIGHTS=lpips_alex.pkl (or pass weights_path=). Produces:
  {'alexnet': {conv0..conv4: {'kernel': HWIO, 'bias': (C,)}},
   'lins': [ (C_l,) nonneg per-channel weights x5 ]}
"""

import argparse
import pickle

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="lpips_alex.pkl")
    args = parser.parse_args()

    import lpips as lpips_pkg  # requires torch + lpips

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    alex = net.net  # alexnet trunk (features sequential inside .slices)
    # torch alexnet conv layers in order
    convs = [m for m in net.net.modules() if m.__class__.__name__ == "Conv2d"]
    assert len(convs) == 5, len(convs)
    params = {}
    for i, conv in enumerate(convs):
        w = conv.weight.detach().numpy()  # (O, I, kH, kW)
        params[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)),  # HWIO for flax
            "bias": conv.bias.detach().numpy(),
        }
    lins = []
    for lin in net.lins:
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        lins.append(np.clip(w.reshape(-1), 0, None))
    with open(args.out, "wb") as f:
        pickle.dump({"alexnet": params, "lins": lins}, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
