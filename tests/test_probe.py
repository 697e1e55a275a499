"""ProbeCNN credibility: the from-scratch probe must actually learn a
nontrivial semantic task (the reference fine-tunes pretrained torchvision
CNNs for its CARLA probes, scripts/train_carla_classifier.py:46-60; this
pins down that our from-scratch replacement has usable probe power)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from video_diffusion_tpu.models.probe import ProbeCNN


def _blob_image(rng, n_blobs, res=32):
    """Image with n_blobs random soft discs — class = blob count, so the
    probe must count objects, not read a pixel statistic."""
    g = np.arange(res)
    gx, gy = np.meshgrid(g, g, indexing="xy")
    img = np.zeros((res, res), dtype=np.float32)
    centers = []
    while len(centers) < n_blobs:
        c = rng.uniform(4, res - 4, size=2)
        if all(np.linalg.norm(c - o) > 7 for o in centers):
            centers.append(c)
    for x, y in centers:
        r = rng.uniform(2.0, 3.0)
        img += np.exp(-((gx - x) ** 2 + (gy - y) ** 2) / r**2)
    img = np.clip(img, 0, 1) * 2 - 1
    img = img + rng.normal(scale=0.05, size=img.shape)
    return np.repeat(img[..., None], 3, axis=-1).astype(np.float32)


def _make_split(rng, n_per_class):
    xs, ys = [], []
    for label, blobs in enumerate((2, 3)):
        for _ in range(n_per_class):
            xs.append(_blob_image(rng, blobs))
            ys.append(label)
    order = rng.permutation(len(xs))
    return np.stack(xs)[order], np.array(ys)[order]


def test_probe_cnn_learns_blob_counting():
    rng = np.random.default_rng(0)
    x_train, y_train = _make_split(rng, 160)
    x_test, y_test = _make_split(rng, 32)

    model = ProbeCNN(out_dim=2, widths=(16, 32))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x_train[:2]))["params"]
    tx = optax.adamw(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y):
        def loss_fn(p):
            logits = model.apply({"params": p}, x, train=True)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    B = 32
    n = len(x_train)
    for i in range(400):
        idx = np.arange(i * B, (i + 1) * B) % n
        params, opt_state, loss = step(
            params, opt_state, jnp.asarray(x_train[idx]), jnp.asarray(y_train[idx])
        )

    logits = jax.jit(lambda p, x: model.apply({"params": p}, x))(
        params, jnp.asarray(x_test)
    )
    acc = float((np.asarray(logits).argmax(-1) == y_test).mean())
    assert acc >= 0.9, f"held-out accuracy {acc:.3f} < 0.9"


def test_probe_multihead_shapes():
    model = ProbeCNN(out_dim=3, widths=(16,), n_heads=4)
    x = jnp.zeros((2, 32, 32, 3))
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)
    assert out.shape == (2, 4, 3)
