"""Bind (module, variables, diffusion, conditioning) into the plain
``model_fn`` signatures the diffusion loops expect.

The wrappers own timestep handling: sampler-facing t is remapped through the
respacing ``timestep_map`` and rescaled before it reaches the network —
equivalent to the reference's respace._WrappedModel (respace.py:103-119).
"""

from typing import Any, Dict, Optional

import jax.numpy as jnp


def make_image_model_fn(model, variables, diffusion, *, y=None, train=False,
                        low_res=None):
    """model_fn(x, t[, rng]) for image models; x: (B, H, W, C)."""

    def model_fn(x, t, rng=None, cond=None):
        del rng, cond
        t_model = diffusion.scale_timesteps(t)
        kwargs: Dict[str, Any] = dict(train=train)
        if y is not None:
            kwargs["y"] = y
        if low_res is not None:
            kwargs["low_res"] = low_res
            return model.apply(variables, x, t_model, **kwargs)
        out = model.apply(variables, x[:, None], t_model, **kwargs)
        return out[:, 0]

    return model_fn


def _placeholder_cond(x0, t):
    """Conditioning placeholders for observed_frames='x_0' sampling — the
    reference passes x_t_minus_1=x0 as an unused placeholder
    (video_sample.py:163)."""
    return dict(
        x_t_minus_1=x0,
        x_random=x0,
        random_t=jnp.zeros(t.shape, dtype=jnp.int32),
        hybrid=x0,
    )


def make_video_model_fn(
    model,
    variables,
    diffusion,
    *,
    x0,
    obs_mask,
    latent_mask,
    kinda_marg_mask,
    frame_indices,
    observed_frames: str = "x_0",
    train: bool = False,
    disable_obs_conditioning: bool = False,
    dropout_rng=None,
):
    """model_fn for CondMarg video models.

    Call patterns:
      model_fn(x, t, cond)  — training (cond built by training_losses)
      model_fn(x, t)        — sampling with observed_frames='x_0'
      model_fn(x, t, rng=r) — sampling regenerating conditioning per step

    ``disable_obs_conditioning`` implements the gradient-method variant where
    the model runs with obs_mask zeroed and latent_mask widened
    (gaussian_diffusion.py:264-271).
    """
    if disable_obs_conditioning:
        eff_obs_mask = jnp.zeros_like(obs_mask)
        eff_latent_mask = obs_mask + latent_mask
    else:
        eff_obs_mask = obs_mask
        eff_latent_mask = latent_mask

    apply_rngs = {"dropout": dropout_rng} if dropout_rng is not None else None

    def apply(x, t, cond):
        t_model = diffusion.scale_timesteps(t)
        return model.apply(
            variables,
            x,
            t_model,
            rngs=apply_rngs,
            x0=x0,
            obs_mask=eff_obs_mask,
            latent_mask=eff_latent_mask,
            kinda_marg_mask=kinda_marg_mask,
            frame_indices=frame_indices,
            observed_frames=observed_frames,
            train=train,
            **cond,
        )

    def model_fn(x, t, rng=None, cond: Optional[dict] = None):
        if cond is None:
            if rng is None:
                cond = _placeholder_cond(x0, t)
            else:
                cond = diffusion.make_conditioning_variants(
                    x0, t, None, rng, observed_frames
                )
        return apply(x, t, cond)

    return model_fn
