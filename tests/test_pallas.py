"""Pallas kernel parity tests (interpreter mode on CPU; the same kernels
compile natively on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from video_diffusion_tpu.ops.pallas_kernels import (
    group_norm_silu,
    group_norm_silu_reference,
)


@pytest.mark.parametrize("shape", [(2, 8, 8, 64), (3, 5, 32)])
def test_group_norm_silu_parity(shape):
    key = jax.random.PRNGKey(0)
    C = shape[-1]
    x = jax.random.normal(key, shape, dtype=jnp.float32) * 2 + 0.3
    scale = jax.random.normal(jax.random.PRNGKey(1), (C,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.1
    ref = group_norm_silu_reference(x, scale, bias, num_groups=32 if C >= 32 else 8)
    got = group_norm_silu(
        x, scale, bias, num_groups=32 if C >= 32 else 8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_group_norm_silu_bf16():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 64), dtype=jnp.bfloat16)
    scale = jnp.ones((64,))
    bias = jnp.zeros((64,))
    ref = group_norm_silu_reference(x, scale, bias)
    got = group_norm_silu(x, scale, bias, interpret=True)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32), atol=2e-2
    )
