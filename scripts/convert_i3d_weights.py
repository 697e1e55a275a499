"""Offline converter: tfhub 'i3d-kinetics-400' SavedModel -> our Flax pickle.

Run once in an environment with tensorflow + tensorflow_hub:

    python scripts/convert_i3d_weights.py --out weights/i3d_kinetics400.pkl

The default output location is picked up automatically by
video_diffusion_tpu.eval.i3d.FVDFeatureExtractor (or set I3D_WEIGHTS).
The name/layout mapping lives in video_diffusion_tpu.eval.convert and is
round-trip parity-tested in tests/test_weight_conversion.py.
"""

import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from video_diffusion_tpu.eval.convert import tfhub_i3d_to_flax


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="weights/i3d_kinetics400.pkl")
    parser.add_argument(
        "--hub_url", default="https://tfhub.dev/deepmind/i3d-kinetics-400/1"
    )
    args = parser.parse_args()

    import tensorflow.compat.v1 as tf
    import tensorflow_hub as hub

    tf.disable_eager_execution()
    with tf.Graph().as_default():
        module = hub.Module(args.hub_url)  # noqa: F841 (registers variables)
        with tf.train.MonitoredSession() as sess:
            var_map = {v.name: sess.run(v) for v in tf.global_variables()}

    variables = tfhub_i3d_to_flax(var_map)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(variables, f)
    print(f"wrote {args.out} ({len(var_map)} variables)")


if __name__ == "__main__":
    main()
