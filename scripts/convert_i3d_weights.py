"""Offline converter: tfhub 'i3d-kinetics-400' SavedModel -> our Flax pickle.

Run once in an environment with tensorflow + tensorflow_hub:

    python scripts/convert_i3d_weights.py --out i3d_kinetics400.pkl

then set I3D_WEIGHTS=i3d_kinetics400.pkl. Maps the DeepMind kinetics-i3d
variable names (RGB/inception_i3d/<block>/.../conv_3d/w, batch_norm
moving stats + beta) onto video_diffusion_tpu.eval.i3d.I3D's param tree:
conv kernels are already (kT, kH, kW, I, O); batch-norm running stats go to
'batch_stats', beta to bias.
"""

import argparse
import pickle

import numpy as np


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="i3d_kinetics400.pkl")
    parser.add_argument(
        "--hub_url", default="https://tfhub.dev/deepmind/i3d-kinetics-400/1"
    )
    args = parser.parse_args()

    import tensorflow.compat.v1 as tf
    import tensorflow_hub as hub

    tf.disable_eager_execution()
    with tf.Graph().as_default():
        module = hub.Module(args.hub_url)
        with tf.train.MonitoredSession() as sess:
            var_map = {
                v.name: sess.run(v) for v in tf.global_variables()
            }

    params, batch_stats = {}, {}
    prefix = "module/RGB/inception_i3d/"
    for name, value in var_map.items():
        if not name.startswith(prefix):
            continue
        rel = name[len(prefix):].split(":")[0]
        parts = rel.split("/")
        # e.g. Mixed_3b/Branch_0/Conv3d_0a_1x1/conv_3d/w
        if parts[-2] == "conv_3d" and parts[-1] == "w":
            _set(params, parts[:-1] + ["kernel"], value)
        elif parts[-2] == "conv_3d" and parts[-1] == "b":
            _set(params, parts[:-1] + ["bias"], value)
        elif parts[-2] == "batch_norm":
            leaf = {"beta": "bias", "moving_mean": "mean", "moving_variance": "var"}[
                parts[-1]
            ]
            if leaf == "bias":
                _set(params, parts[:-1] + ["bias"], value.reshape(-1))
            else:
                _set(batch_stats, parts[:-1] + [leaf], value.reshape(-1))

    with open(args.out, "wb") as f:
        pickle.dump({"params": params, "batch_stats": batch_stats}, f)
    print(f"wrote {args.out} ({len(var_map)} variables)")


if __name__ == "__main__":
    main()
