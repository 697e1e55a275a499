"""Training-step throughput + MFU at the flagship model size (VERDICT r2
weak #5: 'training-path performance is unmeasured').

Builds the bench.py flagship CondMarg video model (128ch, 64x64, 20-frame
windows), one jitted SPMD train step (training/train_loop.build_train_step)
on synthetic data, times steady-state steps, and reports:

  s/step, model TFLOP/step (XLA cost analysis), MFU vs bf16 peak.

Env:
  TRAINB        batch size (default 8)
  VDT_PALLAS_ATTN  1 -> fused attention forward + rematerialized einsum
                   backward (ops/fused_attention.fused_rpe_attention_trainable)
  TRAIN_STEPS   timed steps (default 20)

Writes baselines/train_step_bench.json (keyed by the env config) and prints
one JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

V5E_BF16_PEAK_FLOPS = 197e12  # TPU v5e peak bf16, per chip


def main():
    import inspect

    import jax
    import jax.numpy as jnp

    import video_diffusion_tpu.utils  # noqa: F401
    from video_diffusion_tpu.models import factory
    from video_diffusion_tpu.parallel import mesh as mesh_lib
    from video_diffusion_tpu.training.train_loop import (
        TrainState,
        build_train_step,
        make_optimizer,
    )

    B = int(os.environ.get("TRAINB", "8"))
    n_steps = int(os.environ.get("TRAIN_STEPS", "20"))
    ch = int(os.environ.get("TRAIN_CH", "128"))  # lower for CPU smoke tests
    F, size = 20, 64

    defaults = factory.video_model_and_diffusion_defaults()
    defaults.update(
        T=30, image_size=size, num_channels=ch, num_res_blocks=2,
        num_heads=4, attention_resolutions="16,8",
        rp_alpha=30, rp_beta=30, rp_gamma=30, diffusion_steps=1000,
    )
    sig = inspect.signature(factory.create_video_model_and_diffusion)
    kwargs = {k: defaults[k] for k in sig.parameters if k in defaults}
    model, diffusion = factory.create_video_model_and_diffusion(
        **kwargs, use_bf16=True
    )

    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (B, F, size, size, 3)).astype(np.float32)
    fi = np.tile(np.arange(F, dtype=np.int32)[None], (B, 1))
    obs = np.zeros((B, F, 1, 1, 1), np.float32)
    obs[:, :2] = 1
    latent = 1 - obs
    batch = {
        "x": x,
        "frame_indices": fi,
        "obs_mask": obs,
        "latent_mask": latent,
        "kinda_marg_mask": np.zeros_like(obs),
        "t": rng.integers(0, 1000, (B,)).astype(np.int32),
        "weights": np.ones((B,), np.float32),
    }
    batch = mesh_lib.shard_batch(batch, mesh)

    variables = jax.jit(
        lambda r: model.init(
            {"params": r},
            jnp.asarray(x[:1]),
            diffusion.scale_timesteps(jnp.zeros((1,), jnp.int32)),
            x0=jnp.asarray(x[:1]),
            obs_mask=jnp.asarray(obs[:1]),
            latent_mask=jnp.asarray(latent[:1]),
            kinda_marg_mask=jnp.asarray(obs[:1] * 0),
            frame_indices=jnp.asarray(fi[:1]),
            observed_frames="x_0",
        )
    )(jax.random.PRNGKey(0))
    params = variables["params"]
    opt = make_optimizer(lr=1e-4, weight_decay=0.0, iterations=10**6)
    state = TrainState(
        params=params,
        opt_state=opt.init(params),
        ema_params=(jax.tree_util.tree_map(lambda p: p, params),),
        step=jnp.zeros((), jnp.int32),
    )
    step_fn = jax.jit(
        build_train_step(
            model, diffusion, opt, (0.9999,), "x_t_minus_1", True, 1
        )
    )

    # FLOPs from XLA's own cost analysis of the compiled step; the AOT
    # executable is also what we time (donation + re-tracing mixes badly
    # with the tunnel backend — measured InvalidArgument)
    compiled = step_fn.lower(state, batch, jax.random.PRNGKey(1)).compile()
    try:
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    state, metrics = compiled(state, batch, jax.random.PRNGKey(2))
    jax.block_until_ready(metrics)
    t0 = time.time()
    for i in range(n_steps):
        state, metrics = compiled(state, batch, jax.random.PRNGKey(3 + i))
    jax.block_until_ready(metrics)
    dt = (time.time() - t0) / n_steps

    mfu = flops / dt / V5E_BF16_PEAK_FLOPS
    result = {
        "metric": "train_step_seconds",
        "value": round(dt, 4),
        "batch": B,
        "frames": F,
        "image_size": size,
        "tflops_per_step": round(flops / 1e12, 2),
        "mfu_vs_bf16_peak": round(mfu, 4),
        "pallas_attn": os.environ.get("VDT_PALLAS_ATTN", ""),
    }
    print(json.dumps(result))

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_step_bench.json")
    data = {}
    if os.path.exists(path):
        with open(path) as f:
            data = json.load(f)
    key = f"B{B}_pallas{os.environ.get('VDT_PALLAS_ATTN', '0') or '0'}"
    data[key] = result
    with open(path, "w") as f:
        json.dump(data, f, indent=2)


if __name__ == "__main__":
    main()
