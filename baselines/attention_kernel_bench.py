"""Microbenchmark of the fused RPE attention kernel vs its own roofline.

Times fused_rpe_attention standalone on the bench rollout's real shapes
(temporal/spatial attention at ds4/ds8 of the flagship model), counts the
algorithmic FLOPs and minimum HBM traffic, and reports achieved fraction of
the v5e bf16 compute roofline and HBM roofline. This decides whether the
kernel's remaining gap is fixable (overheads) or intrinsic (shapes).

Env: VDT_ATTN_PAD_HEADS / VDT_ATTN_TILE_MB as usual. BENCH_B (default 32,
~the bench's windows-folded batch).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

V5E_BF16 = 197e12
V5E_HBM = 819e9


def flops_bytes(B, D, T, C, H, Fp, use_rpe):
    N = B * D * T
    f = 2 * N * C * 3 * H * Fp          # qkv projection
    f += 2 * N * H * Fp * C             # output projection
    f += 2 * B * D * H * T * T * Fp * 2  # qk^T and att@v
    if use_rpe:
        f += 2 * B * D * H * T * T * Fp * 3  # rk, rq, rv terms
    # hbm: x in + out (bf16), weights negligible, R tensors per (b)
    by = 2 * B * D * T * C * 2
    if use_rpe:
        by += B * T * T * H * Fp * 4 * 3
    return f, by


def main():
    import jax
    import jax.numpy as jnp

    import video_diffusion_tpu.utils  # noqa: F401
    from video_diffusion_tpu.ops.fused_attention import fused_rpe_attention

    B = int(os.environ.get("BENCH_B", "32"))
    H = 4
    shapes = [
        # (name, D, T, C, use_rpe)
        ("temporal_ds4", 256, 20, 384, True),
        ("spatial_ds4", 20, 256, 384, False),
        ("temporal_ds8", 64, 20, 512, True),
        ("spatial_ds8", 20, 64, 512, False),
    ]
    out = {}
    for name, D, T, C, use_rpe in shapes:
        F = C // H
        rng = jax.random.PRNGKey(0)
        x = jax.random.normal(rng, (B, D, T, C), jnp.bfloat16)
        gn_s = jnp.ones((C,))
        gn_b = jnp.zeros((C,))
        w_qkv = jax.random.normal(rng, (C, 3 * C), jnp.bfloat16) * 0.02
        b_qkv = jnp.zeros((3 * C,))
        w_proj = jax.random.normal(rng, (C, C), jnp.bfloat16) * 0.02
        b_proj = jnp.zeros((C,))
        kw = {}
        if use_rpe:
            r = jax.random.normal(rng, (B, T, T, H, F), jnp.bfloat16) * 0.02
            kw = dict(r_k=r, r_q=r, r_v=r,
                      mask_bias=jnp.zeros((B, T, T), jnp.float32))

        def run(xi):
            return fused_rpe_attention(
                xi, gn_s, gn_b, w_qkv, b_qkv, w_proj, b_proj,
                num_heads=H, **kw,
            )

        # distinct inputs per iteration (identical repeated dispatches can be
        # cached/deduped by the remote-execution backend), and chain each
        # call on the previous output so executions serialize
        # One device dispatch for the whole timing loop (per-call dispatch
        # through the remote tunnel costs ~ms and block_until_ready is
        # unreliable); chain the kernel inside a fori_loop and fetch a
        # scalar to force execution.
        n = 20
        loop = jax.jit(
            lambda x0: jax.lax.fori_loop(0, n, lambda i, y: run(y), x0)
        )
        float(jnp.sum(loop(x)))  # compile + warm
        t0 = time.time()
        float(jnp.sum(loop(x)))
        dt = (time.time() - t0) / n

        pad_mode = os.environ.get("VDT_ATTN_PAD_HEADS", "auto")
        Fp = F
        if pad_mode != "0" and F >= 64 and F % 64 != 0:
            Fp = -(-F // 128) * 128
        f, by = flops_bytes(B, D, T, C, H, Fp, use_rpe)
        out[name] = {
            "ms": round(dt * 1e3, 3),
            "tflops_achieved": round(f / dt / 1e12, 1),
            "frac_compute_roofline": round(f / dt / V5E_BF16, 3),
            "frac_hbm_roofline": round(by / dt / V5E_HBM, 3),
        }
        print(name, out[name], flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "attention_kernel_bench.json")
    with open(path, "w") as fjson:
        json.dump(out, fjson, indent=2)


if __name__ == "__main__":
    main()
