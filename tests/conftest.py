"""Test configuration: virtual 8-device CPU mesh + persistent compile cache.

Must set env vars before jax import (the fake-multichip backend is the test
substitute for real TPU pods; see SURVEY.md §4 implication (d))."""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Note: this environment's sitecustomize exports JAX_PLATFORMS=axon, which
# clobbers the env-var route — force the CPU backend via the config API.
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import video_diffusion_tpu.utils  # noqa: E402,F401  (compilation cache)

assert jax.device_count() >= 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def tiny_video_config(**overrides):
    """Smallest sane CondMarg video model config (GroupNorm needs C % 32 == 0)."""
    import inspect

    from video_diffusion_tpu.models import factory

    defaults = factory.video_model_and_diffusion_defaults()
    defaults.update(
        T=20,
        image_size=32,
        num_channels=32,
        num_res_blocks=1,
        num_heads=2,
        attention_resolutions="16,8",
        rp_alpha=20,
        rp_beta=20,
        rp_gamma=20,
        diffusion_steps=100,
    )
    defaults.update(overrides)
    sig = inspect.signature(factory.create_video_model_and_diffusion)
    return {k: defaults[k] for k in sig.parameters if k in defaults}


@pytest.fixture(scope="session")
def tiny_video_model_and_diffusion():
    from video_diffusion_tpu.models import factory

    return factory.create_video_model_and_diffusion(**tiny_video_config())


@pytest.fixture(scope="session")
def tiny_video_variables(tiny_video_model_and_diffusion):
    import jax
    import jax.numpy as jnp

    model, diffusion = tiny_video_model_and_diffusion
    B, F = 1, 5
    x = jnp.zeros((B, F, 32, 32, 3))
    masks = jnp.zeros((B, F, 1, 1, 1))
    fi = jnp.broadcast_to(jnp.arange(F)[None], (B, F))
    t = jnp.zeros((B,), dtype=jnp.int32)
    return tiny_video_model_and_diffusion[0].init(
        {"params": jax.random.PRNGKey(0)},
        x,
        diffusion.scale_timesteps(t),
        x0=x,
        obs_mask=masks,
        latent_mask=1 - masks,
        kinda_marg_mask=masks,
        frame_indices=fi,
        observed_frames="x_0",
    )
