"""video_diffusion_tpu: a TPU-native (JAX/Flax/Pallas) flexible video diffusion
framework.

Re-designed from scratch with the capabilities of the FDM research codebase
(cliangyu/video-diffusion, itself a fork of openai/improved-diffusion):
frame-set-conditional video DDPMs with a factorized spatio-temporal U-Net,
relative-position-encoded temporal attention, pluggable long-video inference
strategies, and the full train/sample/eval CLI surface.

TPU-first design notes
----------------------
* All tensors are channels-last (B, T, H, W, C) on device; the reference's
  (B, T, C, H, W) layout is used only at file-IO boundaries for parity.
* Diffusion math lives in pure functions over a ``GaussianDiffusion`` pytree
  of f32 coefficient arrays (precomputed in float64 on host).
* Sampling loops are ``lax.scan`` over timesteps (and, for non-adaptive
  inference strategies, over inference steps too) with zero host round trips.
* Parallelism is expressed with ``jax.sharding.Mesh`` + NamedSharding;
  XLA inserts the collectives (psum for grads over the ``data`` axis).
* bf16 compute / f32 params replaces the reference's fp16 master-param
  loss-scaling machinery entirely.
"""

__version__ = "0.1.0"
