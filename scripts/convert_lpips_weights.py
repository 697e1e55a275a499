"""Offline converter: torch `lpips` package weights -> our Flax pickle.

Run once in any environment with torch + lpips installed:

    python scripts/convert_lpips_weights.py --out weights/lpips_alex.pkl

The default output location is picked up automatically by
video_diffusion_tpu.eval.lpips.LPIPS (or point LPIPS_WEIGHTS at it).
The layout mapping itself lives in video_diffusion_tpu.eval.convert and is
parity-tested against a torch-built LPIPS in tests/test_weight_conversion.py.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from video_diffusion_tpu.eval.convert import torch_lpips_to_flax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights/lpips_alex.pkl")
    args = parser.parse_args()

    import lpips as lpips_pkg  # requires torch + lpips

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    convs = [m for m in net.net.modules() if m.__class__.__name__ == "Conv2d"]
    assert len(convs) == 5, len(convs)
    conv_weights = [
        (c.weight.detach().numpy(), c.bias.detach().numpy()) for c in convs
    ]
    lin_weights = [lin.model[-1].weight.detach().numpy() for lin in net.lins]
    data = torch_lpips_to_flax(conv_weights, lin_weights)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(data, f)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
