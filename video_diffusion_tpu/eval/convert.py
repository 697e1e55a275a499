"""Pretrained-weight conversion: torch LPIPS / tfhub I3D -> Flax pickles.

The mapping logic lives here (importable, parity-tested in
tests/test_weight_conversion.py against torch-built reference networks with
synthetic weights); scripts/convert_lpips_weights.py and
scripts/convert_i3d_weights.py are thin CLIs that fetch the real pretrained
weights in an environment that has them (torch+lpips / tensorflow_hub) and
call these functions.

Reference counterparts: the `lpips` package load in
/root/reference/scripts/video_eval.py:228-252 and the tfhub i3d-kinetics-400
graph in /root/reference/improved_diffusion/frechet_video_distance.py:70-133.
"""

import numpy as np

# -------------------------------------------------------------------- #
# LPIPS (AlexNet trunk + per-layer linear heads)
# -------------------------------------------------------------------- #


def torch_lpips_to_flax(conv_weights, lin_weights):
    """Convert torch-layout LPIPS weights to the Flax pickle dict.

    :param conv_weights: list of 5 (weight, bias) numpy pairs from the
        AlexNet trunk's Conv2d layers in order; weight is OIHW.
    :param lin_weights: list of 5 numpy arrays from the LPIPS linear heads
        (``lin.model[-1].weight``, shape (1, C, 1, 1) or (C,)).
    :return: {'alexnet': {conv0..conv4: {'kernel': HWIO, 'bias': (C,)}},
              'lins': [(C,) nonneg x5]}
    """
    assert len(conv_weights) == 5 and len(lin_weights) == 5
    params = {}
    for i, (w, b) in enumerate(conv_weights):
        w = np.asarray(w)
        assert w.ndim == 4, w.shape
        params[f"conv{i}"] = {
            "kernel": np.transpose(w, (2, 3, 1, 0)).astype(np.float32),
            "bias": np.asarray(b, dtype=np.float32).reshape(-1),
        }
    lins = [
        np.clip(np.asarray(w, dtype=np.float32).reshape(-1), 0, None)
        for w in lin_weights
    ]
    return {"alexnet": params, "lins": lins}


# -------------------------------------------------------------------- #
# I3D (tfhub deepmind/i3d-kinetics-400 variable names)
# -------------------------------------------------------------------- #

_TFHUB_PREFIX = "RGB/inception_i3d/"


def _set(tree, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def tfhub_i3d_to_flax(var_map):
    """Map DeepMind kinetics-i3d variables onto eval.i3d.I3D's tree.

    :param var_map: {variable_name: numpy value} from the tfhub SavedModel;
        names like 'module/RGB/inception_i3d/Mixed_3b/Branch_0/
        Conv3d_0a_1x1/conv_3d/w:0'. Conv kernels are already
        (kT, kH, kW, I, O); batch-norm moving stats go to 'batch_stats',
        beta to the BN bias.
    :return: flax variables dict {'params': ..., 'batch_stats': ...}
    """
    params, batch_stats = {}, {}
    n_mapped = 0
    for name, value in var_map.items():
        key = name.split(":")[0]
        idx = key.find(_TFHUB_PREFIX)
        if idx < 0:
            continue
        parts = key[idx + len(_TFHUB_PREFIX):].split("/")
        if len(parts) < 3:
            continue
        leaf_module, var = parts[-2], parts[-1]
        # Flax key structure: inception blocks are one module level
        # ('Mixed_3b') containing Unit3Ds whose names keep the remaining
        # slashes ('Branch_0/Conv3d_0a_1x1'); stem/logits Unit3D names keep
        # their slashes at the top level ('Logits/Conv3d_0c_1x1').
        mod_path = parts[:-2]
        if mod_path[0].startswith("Mixed"):
            keys = [mod_path[0], "/".join(mod_path[1:]), leaf_module]
        else:
            keys = ["/".join(mod_path), leaf_module]
        if leaf_module == "conv_3d" and var == "w":
            _set(params, keys + ["kernel"], np.asarray(value))
        elif leaf_module == "conv_3d" and var == "b":
            _set(params, keys + ["bias"], np.asarray(value).reshape(-1))
        elif leaf_module == "batch_norm":
            leaf = {
                "beta": (params, "bias"),
                "moving_mean": (batch_stats, "mean"),
                "moving_variance": (batch_stats, "var"),
            }.get(var)
            if leaf is None:
                continue
            _set(leaf[0], keys + [leaf[1]], np.asarray(value).reshape(-1))
        else:
            continue
        n_mapped += 1
    if n_mapped == 0:
        raise ValueError("no inception_i3d variables found in var_map")
    return {"params": params, "batch_stats": batch_stats}


def flax_i3d_to_tfhub_names(variables, prefix="module/" + _TFHUB_PREFIX):
    """Inverse of tfhub_i3d_to_flax (used by the round-trip parity test):
    emit a {tfhub_name: value} map from a Flax I3D variables dict."""
    out = {}

    def walk(node, path, kind):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, path + [k], kind)
                continue
            base = "/".join(path)
            v = np.asarray(v)
            if kind == "params" and k == "kernel":
                out[f"{prefix}{base}/w:0"] = v
            elif kind == "params" and k == "bias" and path[-1] == "conv_3d":
                out[f"{prefix}{base}/b:0"] = v
            elif kind == "params" and k == "bias" and path[-1] == "batch_norm":
                out[f"{prefix}{base}/beta:0"] = v.reshape(1, 1, 1, 1, -1)
            elif kind == "batch_stats" and k == "mean":
                out[f"{prefix}{base}/moving_mean:0"] = v.reshape(1, 1, 1, 1, -1)
            elif kind == "batch_stats" and k == "var":
                out[f"{prefix}{base}/moving_variance:0"] = v.reshape(1, 1, 1, 1, -1)

    walk(variables.get("params", {}), [], "params")
    walk(variables.get("batch_stats", {}), [], "batch_stats")
    return out
