"""Model/diffusion factories and config defaults.

Mirrors /root/reference/improved_diffusion/script_util.py:15-436 — same
default dicts, same channel_mult-per-image-size tables, same flag names —
so checkpoint-embedded configs round-trip identically. A ``use_bf16`` knob
(absent in the reference, which used fp16 master params) selects the bf16
compute policy on TPU.
"""

import os

import jax.numpy as jnp

from ..ops.diffusion import create_diffusion
from .unet import CondMargVideoUNet, SuperResUNet, UNet, VideoUNet

NUM_CLASSES = 1000


def model_and_diffusion_defaults():
    """Defaults for image training (reference script_util.py:15-38)."""
    return dict(
        image_size=-1,
        num_channels=128,
        num_res_blocks=2,
        num_heads=4,
        num_heads_upsample=-1,
        attention_resolutions="16,8",
        dropout=0.0,
        learn_sigma=False,
        sigma_small=False,
        class_cond=False,
        diffusion_steps=1000,
        noise_schedule="linear",
        timestep_respacing="",
        use_kl=False,
        predict_xstart=False,
        rescale_timesteps=True,
        rescale_learned_sigmas=True,
        use_checkpoint=False,
        use_scale_shift_norm=True,
        use_spatial_encoding=False,
    )


def video_model_and_diffusion_defaults():
    """Defaults for video training (reference script_util.py:41-57)."""
    defaults = model_and_diffusion_defaults()
    defaults["T"] = -1
    defaults["use_spatial_encoding"] = True
    defaults["use_frame_encoding"] = False
    defaults["cross_frame_attention"] = True
    defaults["do_cond_marg"] = True
    defaults["enforce_position_invariance"] = False
    defaults["temporal_augment_type"] = "add_manyhead_presoftmax_time"  # dead config
    defaults["use_rpe_net"] = True
    defaults["cond_emb_type"] = "channel"
    defaults["rp_alpha"] = None
    defaults["rp_beta"] = None
    defaults["rp_gamma"] = None
    defaults["allow_interactions_between_padding"] = True
    return defaults


def _channel_mult(image_size, video=False):
    if image_size == 256:
        return (1, 1, 2, 2, 4, 4)
    if image_size == 128 and video:
        return (1, 1, 2, 3, 4)
    if image_size == 64:
        return (1, 2, 3, 4)
    if image_size == 32:
        return (1, 2, 2, 2)
    raise ValueError(f"unsupported image size: {image_size}")


def _attention_ds(image_size, attention_resolutions):
    return tuple(
        image_size // int(res) for res in str(attention_resolutions).split(",")
    )


def create_model(
    image_size,
    num_channels,
    num_res_blocks,
    learn_sigma,
    class_cond,
    use_checkpoint,
    attention_resolutions,
    num_heads,
    num_heads_upsample,
    use_scale_shift_norm,
    dropout,
    use_spatial_encoding,
    use_bf16=False,
):
    """Image U-Net (reference script_util.py:184-226)."""
    config = dict(
        in_channels=3,
        model_channels=num_channels,
        out_channels=(3 if not learn_sigma else 6),
        num_res_blocks=num_res_blocks,
        attention_resolutions=_attention_ds(image_size, attention_resolutions),
        dropout=dropout,
        channel_mult=_channel_mult(image_size),
        num_classes=(NUM_CLASSES if class_cond else None),
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        use_spatial_encoding=use_spatial_encoding,
        image_size=image_size,
        video_T=1,
        cross_frame_attention=False,
        dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
    )
    return VideoUNet(config=config)


def create_video_model(
    T,
    image_size,
    num_channels,
    num_res_blocks,
    learn_sigma,
    class_cond,
    use_checkpoint,
    attention_resolutions,
    num_heads,
    num_heads_upsample,
    use_scale_shift_norm,
    dropout,
    use_spatial_encoding,
    use_frame_encoding,
    cross_frame_attention,
    do_cond_marg,
    enforce_position_invariance,
    temporal_augment_type,  # accepted and dropped, like the reference
    use_rpe_net,
    rp_alpha,
    rp_beta,
    rp_gamma,
    cond_emb_type,
    allow_interactions_between_padding,
    use_bf16=False,
):
    """Video U-Net, conditional (CondMarg) or not
    (reference script_util.py:229-300)."""
    del temporal_augment_type
    if any([rp_alpha, rp_beta, rp_gamma]):
        bucket_params = dict(alpha=rp_alpha, beta=rp_beta, gamma=rp_gamma)
    else:
        bucket_params = None

    in_channels = 3
    if do_cond_marg:
        base = cond_emb_type.replace("-initzero", "")
        if "channel" in base:
            in_channels += 2
        elif "duplicate" in base or "all" in base:
            in_channels *= 2

    config = dict(
        in_channels=in_channels,
        model_channels=num_channels,
        out_channels=(3 if not learn_sigma else 6),
        num_res_blocks=num_res_blocks,
        attention_resolutions=_attention_ds(image_size, attention_resolutions),
        dropout=dropout,
        channel_mult=_channel_mult(image_size, video=True),
        num_classes=(NUM_CLASSES if class_cond else None),
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        use_spatial_encoding=use_spatial_encoding,
        image_size=image_size,
        use_rpe_net=use_rpe_net,
        bucket_params=bucket_params,
        allow_interactions_between_padding=allow_interactions_between_padding,
        video_T=T,
        use_frame_encoding=use_frame_encoding,
        cross_frame_attention=cross_frame_attention,
        enforce_position_invariance=enforce_position_invariance,
        use_pallas_attention=os.environ.get("VDT_PALLAS_ATTN", "") == "1",
        use_pallas_gn=os.environ.get("VDT_PALLAS_GN", "") == "1",
        dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
        # inference-only HBM lever: keep the output head at the compute
        # dtype (see UNet.bf16_tail). Read at model construction, like the
        # Pallas knobs above; no effect unless use_bf16 is also on.
        bf16_tail=os.environ.get("VDT_BF16_TAIL", "") == "1" and use_bf16,
    )
    if do_cond_marg:
        return CondMargVideoUNet(config=config, cond_emb_type=cond_emb_type)
    return VideoUNet(config=config)


def create_model_and_diffusion(
    image_size,
    class_cond,
    learn_sigma,
    sigma_small,
    num_channels,
    num_res_blocks,
    num_heads,
    num_heads_upsample,
    attention_resolutions,
    dropout,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    use_checkpoint,
    use_scale_shift_norm,
    use_spatial_encoding,
    use_bf16=False,
):
    model = create_model(
        image_size,
        num_channels,
        num_res_blocks,
        learn_sigma=learn_sigma,
        class_cond=class_cond,
        use_checkpoint=use_checkpoint,
        attention_resolutions=attention_resolutions,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dropout=dropout,
        use_spatial_encoding=use_spatial_encoding,
        use_bf16=use_bf16,
    )
    diffusion = create_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        sigma_small=sigma_small,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return model, diffusion


def create_video_model_and_diffusion(
    T,
    image_size,
    class_cond,
    learn_sigma,
    sigma_small,
    num_channels,
    num_res_blocks,
    num_heads,
    num_heads_upsample,
    attention_resolutions,
    dropout,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    use_checkpoint,
    use_scale_shift_norm,
    use_spatial_encoding,
    use_frame_encoding,
    cross_frame_attention,
    do_cond_marg,
    enforce_position_invariance,
    temporal_augment_type,
    use_rpe_net,
    rp_alpha,
    rp_beta,
    rp_gamma,
    cond_emb_type,
    allow_interactions_between_padding,
    use_bf16=False,
):
    """Reference script_util.py:110-181."""
    model = create_video_model(
        T,
        image_size,
        num_channels,
        num_res_blocks,
        learn_sigma=learn_sigma,
        class_cond=class_cond,
        use_checkpoint=use_checkpoint,
        attention_resolutions=attention_resolutions,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        dropout=dropout,
        use_spatial_encoding=use_spatial_encoding,
        use_frame_encoding=use_frame_encoding,
        cross_frame_attention=cross_frame_attention,
        do_cond_marg=do_cond_marg,
        enforce_position_invariance=enforce_position_invariance,
        temporal_augment_type=temporal_augment_type,
        use_rpe_net=use_rpe_net,
        rp_alpha=rp_alpha,
        rp_beta=rp_beta,
        rp_gamma=rp_gamma,
        cond_emb_type=cond_emb_type,
        allow_interactions_between_padding=allow_interactions_between_padding,
        use_bf16=use_bf16,
    )
    diffusion = create_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        sigma_small=sigma_small,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return model, diffusion


def sr_model_and_diffusion_defaults():
    res = model_and_diffusion_defaults()
    res["large_size"] = 256
    res["small_size"] = 64
    for k in ("image_size", "use_spatial_encoding", "class_cond", "sigma_small"):
        res.pop(k, None)
    return res


def sr_create_model_and_diffusion(
    large_size,
    small_size,
    learn_sigma,
    num_channels,
    num_res_blocks,
    num_heads,
    num_heads_upsample,
    attention_resolutions,
    dropout,
    diffusion_steps,
    noise_schedule,
    timestep_respacing,
    use_kl,
    predict_xstart,
    rescale_timesteps,
    rescale_learned_sigmas,
    use_checkpoint,
    use_scale_shift_norm,
    class_cond=False,
    use_bf16=False,
):
    """Super-resolution cascade model (reference script_util.py:314-402)."""
    del small_size
    if large_size == 256:
        channel_mult = (1, 1, 2, 2, 4, 4)
    elif large_size == 64:
        channel_mult = (1, 2, 3, 4)
    else:
        raise ValueError(f"unsupported large size: {large_size}")
    config = dict(
        in_channels=6,
        model_channels=num_channels,
        out_channels=(3 if not learn_sigma else 6),
        num_res_blocks=num_res_blocks,
        attention_resolutions=_attention_ds(large_size, attention_resolutions),
        dropout=dropout,
        channel_mult=channel_mult,
        num_classes=(NUM_CLASSES if class_cond else None),
        use_checkpoint=use_checkpoint,
        num_heads=num_heads,
        num_heads_upsample=num_heads_upsample,
        use_scale_shift_norm=use_scale_shift_norm,
        image_size=large_size,
        video_T=1,
        cross_frame_attention=False,
        dtype=jnp.bfloat16 if use_bf16 else jnp.float32,
    )
    model = SuperResUNet(config=config)
    diffusion = create_diffusion(
        steps=diffusion_steps,
        learn_sigma=learn_sigma,
        noise_schedule=noise_schedule,
        use_kl=use_kl,
        predict_xstart=predict_xstart,
        rescale_timesteps=rescale_timesteps,
        rescale_learned_sigmas=rescale_learned_sigmas,
        timestep_respacing=timestep_respacing,
    )
    return model, diffusion


def args_to_dict(args, keys):
    """Round-trip an argparse Namespace into factory kwargs
    (reference script_util.py:449-454)."""
    backups = {"allow_interactions_between_padding": True}
    return {
        k: getattr(args, k) if hasattr(args, k) else backups[k] for k in keys
    }
