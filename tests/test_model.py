"""Model behavior tests: shapes, conditioning splice semantics, RPE math,
and the padding-isolation property the static-shape design relies on."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_tpu.models.nn import frame_embedding, timestep_embedding
from video_diffusion_tpu.models.wrappers import make_video_model_fn


def test_timestep_embedding_closed_form():
    emb = np.asarray(timestep_embedding(jnp.array([0.0, 1.0]), 8, max_period=100))
    assert emb.shape == (2, 8)
    np.testing.assert_allclose(emb[0], [1, 1, 1, 1, 0, 0, 0, 0], atol=1e-6)
    freqs = np.exp(-np.log(100) * np.arange(4) / 4)
    np.testing.assert_allclose(emb[1, :4], np.cos(freqs), atol=1e-6)
    np.testing.assert_allclose(emb[1, 4:], np.sin(freqs), atol=1e-6)
    # odd dim zero-padded
    emb9 = np.asarray(timestep_embedding(jnp.array([1.0]), 9))
    assert emb9.shape == (1, 9) and emb9[0, -1] == 0


def test_frame_embedding_shape():
    fi = jnp.arange(12).reshape(2, 6)
    emb = frame_embedding(fi, 16, max_period=120)
    assert emb.shape == (2, 6, 16)


def test_rpe_bucket_ids_match_bruteforce():
    """Bucketed iRPE ids equal the reference's piecewise formula
    (unet.py:330-340), including torch negative-index wrapping."""
    from video_diffusion_tpu.models.unet import RPE

    alpha, beta, gamma = 8, 16, 32
    rpe = RPE(channels=8, num_heads=2, use_rpe_net=False,
              alpha=alpha, beta=beta, gamma=gamma)
    d = np.arange(-300, 301)
    got = np.asarray(rpe.get_bucket_ids(jnp.asarray(d.reshape(1, -1, 1))))[:, :, 0]

    def ref_bucket(x):
        if abs(x) <= alpha:
            b = x
        else:
            coef = np.log(abs(x) / alpha) / np.log(gamma / alpha)
            b = int(min(beta, alpha + coef * (beta - alpha))) * int(np.sign(x))
        return int(b) % (2 * beta + 1)

    expected = np.array([ref_bucket(x) for x in d])
    np.testing.assert_array_equal(got[0], expected)
    assert got.min() >= 0 and got.max() <= 2 * beta


def test_rpenet_zero_init_gives_zero_bias():
    from video_diffusion_tpu.models.unet import RPENet

    net = RPENet(channels=8, num_heads=2)
    temb = jnp.ones((2, 4, 16))
    dist = jnp.arange(-2, 2).reshape(1, 4, 1) - jnp.zeros((1, 1, 4))
    v = net.init(jax.random.PRNGKey(0), temb, dist)
    out = net.apply(v, temb, dist)
    assert out.shape == (2, 4, 4, 2, 4)
    np.testing.assert_array_equal(np.asarray(out), 0.0)


@pytest.fixture(scope="module")
def video_setup(tiny_video_model_and_diffusion, tiny_video_variables):
    """Perturb all params away from init: zero-init output/proj layers make a
    fresh model output exactly 0, which would hide conditioning effects."""
    model, diffusion = tiny_video_model_and_diffusion
    leaves, treedef = jax.tree_util.tree_flatten(tiny_video_variables)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [
        p + 0.02 * jax.random.normal(k, p.shape, p.dtype)
        for p, k in zip(leaves, keys)
    ]
    variables = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, diffusion, variables


def _inputs(B=1, F=5, key=0):
    k = jax.random.PRNGKey(key)
    x = jax.random.uniform(k, (B, F, 32, 32, 3), minval=-1, maxval=1)
    e = (1, 1, 1)
    obs = jnp.zeros((B, F, *e)).at[:, :2].set(1.0)
    latent = jnp.zeros((B, F, *e)).at[:, 2:4].set(1.0)
    marg = jnp.zeros((B, F, *e))
    fi = jnp.broadcast_to(jnp.array([0, 3, 7, 12, 0])[None], (B, F))
    t = jnp.full((B,), 43, dtype=jnp.int32)
    return x, obs, latent, marg, fi, t


def test_forward_shapes_and_finite(video_setup):
    model, diffusion, variables = video_setup
    x, obs, latent, marg, fi, t = _inputs()
    mf = make_video_model_fn(
        model, variables, diffusion, x0=x, obs_mask=obs, latent_mask=latent,
        kinda_marg_mask=marg, frame_indices=fi, observed_frames="x_0",
    )
    out = mf(x, t)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_attention_mask_blocks_padding():
    """Real-frame queries must put zero attention weight on masked (pad)
    tokens, and pad content must not change real-token outputs of the
    attention block itself (the reference mask semantics, unet.py:511-528).
    Note: full-model isolation does NOT hold because the temporal pre-norm
    pools statistics over the frame axis — which is why the samplers use
    variable-width windows instead of padding (sampling/sampler.py)."""
    from video_diffusion_tpu.models.unet import RPEAttention

    B, D, T, C = 1, 3, 5, 32
    att = RPEAttention(channels=C, num_heads=2,
                      allow_interactions_between_padding=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, D, T, C))
    am = jnp.array([[1.0, 1.0, 1.0, 1.0, 0.0]])  # slot 4 is padding
    v = att.init(jax.random.PRNGKey(1), x, None, None, am)
    # capture attention: run with sow
    out1, state = att.apply(
        v, x, None, None, am, capture_attn=True, mutable=["intermediates"]
    )
    attn = np.asarray(state["intermediates"]["attn"][0])  # (B, T, T)
    np.testing.assert_allclose(attn[0, :4, 4], 0.0, atol=1e-7)
    # pad row attends only to itself (pad<->pad group)
    np.testing.assert_allclose(attn[0, 4, 4], 1.0, atol=1e-6)


def test_observed_content_is_used(video_setup):
    """Changing x0 at an observed slot must change latent outputs (the model
    is actually conditioning); changing x0 at a latent slot must not (the
    splice only injects observed content)."""
    model, diffusion, variables = video_setup
    x, obs, latent, marg, fi, t = _inputs()

    def run(x0):
        mf = make_video_model_fn(
            model, variables, diffusion, x0=x0, obs_mask=obs,
            latent_mask=latent, kinda_marg_mask=marg, frame_indices=fi,
            observed_frames="x_0",
        )
        return np.asarray(mf(x, t))

    base = run(x)
    x0_obs = x.at[:, 0].add(0.5)
    assert np.abs(run(x0_obs)[:, 2:4] - base[:, 2:4]).max() > 1e-6
    x0_lat = x.at[:, 2].add(0.5)
    np.testing.assert_allclose(run(x0_lat), base, atol=2e-5)


def test_observed_frames_modes(video_setup):
    """All observed_frames modes run and differ from each other."""
    model, diffusion, variables = video_setup
    x, obs, latent, marg, fi, t = _inputs()
    outs = {}
    for mode in ["x_0", "x_t", "x_t_minus_1", "x_random", "hybrid_10"]:
        mf = make_video_model_fn(
            model, variables, diffusion, x0=x, obs_mask=obs,
            latent_mask=latent, kinda_marg_mask=marg, frame_indices=fi,
            observed_frames=mode, train=True,
        )
        cond = diffusion.make_conditioning_variants(
            x, t, None, jax.random.PRNGKey(5), mode
        )
        outs[mode] = np.asarray(mf(x, t, cond=cond))
        assert np.isfinite(outs[mode]).all()
    assert np.abs(outs["x_0"] - outs["x_t"]).max() > 1e-7


def test_bf16_tail_knob(video_setup, monkeypatch):
    """VDT_BF16_TAIL=1 (at model construction) keeps the output head at the
    compute dtype: bf16 output, same param tree, close to the f32-tail bf16
    model; inert without use_bf16. Also checks the splice-exactness property
    the sampler's x0 narrowing relies on: for a bf16 model, pre-casting the
    x0 conditioning to bf16 is bit-identical (disjoint 0/1 mask splice)."""
    from tests.conftest import tiny_video_config

    from video_diffusion_tpu.models import factory

    _, _, variables = video_setup
    x, obs, latent, marg, fi, t = _inputs()
    cfg = tiny_video_config()

    def run(model, x0):
        mf = make_video_model_fn(
            model, variables, diffusion, x0=x0, obs_mask=obs,
            latent_mask=latent, kinda_marg_mask=marg, frame_indices=fi,
            observed_frames="x_0",
        )
        return mf(x, t)

    bf16_model, diffusion = factory.create_video_model_and_diffusion(
        **cfg, use_bf16=True
    )
    base = run(bf16_model, x)
    assert base.dtype == jnp.float32  # f32 tail by default

    monkeypatch.setenv("VDT_BF16_TAIL", "1")
    # knob is inert for an f32 model
    f32_model, _ = factory.create_video_model_and_diffusion(**cfg)
    assert run(f32_model, x).dtype == jnp.float32

    tail_model, _ = factory.create_video_model_and_diffusion(
        **cfg, use_bf16=True
    )
    out = run(tail_model, x)
    assert out.dtype == jnp.bfloat16
    # same params (head layout unchanged), output within bf16 rounding of
    # the f32-tail bf16 model (|x| <= ~1 here -> absolute tolerance ~2^-7)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(base), atol=0.05
    )
    # splice exactness: bf16 x0 conditioning is bit-identical for bf16 models
    np.testing.assert_array_equal(
        np.asarray(run(bf16_model, x.astype(jnp.bfloat16).astype(jnp.float32))),
        np.asarray(run(bf16_model, x)),
    )


def test_image_model_forward():
    import inspect

    from video_diffusion_tpu.models import factory
    from video_diffusion_tpu.models.wrappers import make_image_model_fn

    defaults = factory.model_and_diffusion_defaults()
    defaults.update(image_size=32, num_channels=32, num_res_blocks=1,
                    num_heads=2, diffusion_steps=100)
    sig = inspect.signature(factory.create_model_and_diffusion)
    kwargs = {k: defaults[k] for k in sig.parameters if k in defaults}
    model, diffusion = factory.create_model_and_diffusion(**kwargs)
    x = jnp.zeros((2, 32, 32, 3))
    t = jnp.array([0, 50])
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x[:, None], diffusion.scale_timesteps(t)
    )
    mf = make_image_model_fn(model, variables, diffusion)
    out = mf(x, t)
    assert out.shape == (2, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_dminor_attention_parity(monkeypatch):
    """The d-minor (pixels-on-lanes) einsum layout must match the standard
    layout numerically — same contractions, different operand layouts —
    including the RPE q/k/v biases, the padding mask, and the sown
    attention probe."""
    from video_diffusion_tpu.models.unet import RPEAttention

    B, D, T, C, H = 2, 128, 6, 32, 4
    blk = RPEAttention(
        channels=C, num_heads=H,
        use_rpe_q=True, use_rpe_k=True, use_rpe_v=True, use_rpe_net=True,
    )
    r = jax.random.PRNGKey(0)
    x = jax.random.normal(r, (B, D, T, C), dtype=jnp.float32)
    temb = jax.random.normal(jax.random.PRNGKey(1), (B, T, 16))
    fi = jnp.tile(jnp.arange(T)[None], (B, 1))
    mask = jnp.array([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]], jnp.float32)

    monkeypatch.setenv("VDT_ATTN_DMINOR", "0")
    variables = blk.init(
        {"params": jax.random.PRNGKey(2)}, x, temb=temb, frame_indices=fi,
        attn_mask=mask,
    )
    y0, s0 = blk.apply(
        variables, x, temb=temb, frame_indices=fi, attn_mask=mask,
        capture_attn=True, mutable=["intermediates"],
    )

    monkeypatch.setenv("VDT_ATTN_DMINOR", "1")
    y1, s1 = blk.apply(
        variables, x, temb=temb, frame_indices=fi, attn_mask=mask,
        capture_attn=True, mutable=["intermediates"],
    )
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=2e-5)
    a0 = np.asarray(s0["intermediates"]["attn"][0])
    a1 = np.asarray(s1["intermediates"]["attn"][0])
    assert a0.shape == a1.shape
    np.testing.assert_allclose(a0, a1, atol=2e-5)


def test_dminor_full_model_parity(video_setup, monkeypatch):
    """Forcing the d-minor layout through the whole video UNet (temporal AND
    spatial attention) must reproduce the standard-layout output."""
    model, diffusion, variables = video_setup
    x, obs, latent, marg, fi, t = _inputs()

    def run():
        mf = make_video_model_fn(
            model, variables, diffusion, x0=x, obs_mask=obs,
            latent_mask=latent, kinda_marg_mask=marg, frame_indices=fi,
            observed_frames="x_0",
        )
        return mf(x, t)

    monkeypatch.setenv("VDT_ATTN_DMINOR", "0")
    base = np.asarray(run())
    monkeypatch.setenv("VDT_ATTN_DMINOR", "1")
    forced = np.asarray(run())
    np.testing.assert_allclose(base, forced, atol=2e-5)


def test_pallas_temporal_gate(monkeypatch):
    """VDT_PALLAS_ATTN_TEMPORAL=auto routes temporal attention off the fused
    kernel exactly where the d-minor einsum layout applies — the config the
    round-4 bench A/B measured fastest (baselines/bench_ab_r4.json); 0/1
    force einsum/kernel respectively."""
    from video_diffusion_tpu.models.unet import _pallas_temporal_enabled

    monkeypatch.delenv("VDT_PALLAS_ATTN_TEMPORAL", raising=False)
    monkeypatch.delenv("VDT_ATTN_DMINOR", raising=False)
    # inference, few tokens over many pixels -> einsum/d-minor path
    assert not _pallas_temporal_enabled(10, 64 * 64, train=False)
    # many tokens: d-minor does not apply -> fused kernel stays
    assert _pallas_temporal_enabled(64, 64 * 64, train=False)
    # few batch pixels: d-minor does not apply -> fused kernel stays
    assert _pallas_temporal_enabled(10, 32, train=False)
    # training graphs never take d-minor -> kernel (trainable wrapper) stays
    assert _pallas_temporal_enabled(10, 64 * 64, train=True)
    # explicit force overrides auto in both directions
    monkeypatch.setenv("VDT_PALLAS_ATTN_TEMPORAL", "1")
    assert _pallas_temporal_enabled(10, 64 * 64, train=False)
    monkeypatch.setenv("VDT_PALLAS_ATTN_TEMPORAL", "0")
    assert not _pallas_temporal_enabled(64, 64 * 64, train=False)


def test_remat_train_grad():
    """use_checkpoint=True must accept train=True/False through the remat
    wrappers (train is a static argnum and must be passed positionally at
    the ResBlock/FactorizedAttentionBlock call sites — regression for the
    keyword-passed train that broke nn.remat static_argnums)."""
    from video_diffusion_tpu.models.unet import VideoUNet

    cfg = dict(
        in_channels=3, model_channels=32, out_channels=6, num_res_blocks=1,
        attention_resolutions=(2,), dropout=0.1, channel_mult=(1, 2),
        num_heads=2, use_rpe_net=True, use_checkpoint=True,
    )
    m = VideoUNet(config=cfg)
    B, T, S = 1, 4, 8
    x = jnp.ones((B, T, S, S, 3)) * 0.1
    t = jnp.zeros((B,), jnp.int32)
    fi = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    v = m.init({"params": jax.random.PRNGKey(0)}, x, t, frame_indices=fi)

    def loss(p, tr):
        y = m.apply(
            {"params": p}, x, t, frame_indices=fi, train=tr,
            rngs={"dropout": jax.random.PRNGKey(1)},
        )
        return jnp.mean(y ** 2)

    for tr in (True, False):
        g = jax.jit(jax.grad(loss), static_argnums=1)(v["params"], tr)
        total = jax.tree_util.tree_reduce(
            lambda a, b: a + jnp.abs(b).sum(), g, 0.0
        )
        assert np.isfinite(float(total))
