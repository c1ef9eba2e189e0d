"""Kernel vs XLA-oracle tests for the Pallas ops (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpo_tpu.ops import attention, flash_attention, xla_attention
from ddpo_tpu.ops.groupnorm import group_norm, group_norm_silu


@pytest.mark.parametrize(
    "b,sq,sk,h,d",
    [
        (2, 256, 256, 4, 40),  # self-attention-like, unaligned head dim
        (1, 256, 77, 8, 80),  # cross-attention with 77-token context
        (1, 130, 130, 2, 64),  # unaligned sequence lengths (padding path)
    ],
)
def test_flash_matches_xla(b, sq, sk, h, d):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, (b, sq, h, d), dtype=jnp.float32)
    k = jax.random.normal(kk, (b, sk, h, d), dtype=jnp.float32)
    v = jax.random.normal(kv, (b, sk, h, d), dtype=jnp.float32)

    ref = xla_attention(q, k, v)
    out = flash_attention(q, k, v, None, 128, 128, True)  # interpret mode
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-3, atol=5e-3)


def test_flash_gradients_match_xla():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 128, 2, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (1, 128, 2, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (1, 128, 2, 32))

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, None, 128, 128, True).sum()

    def loss_xla(q, k, v):
        return xla_attention(q, k, v).sum()

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize(
    "b,sq,sk,h,d",
    [
        (2, 256, 256, 2, 40),    # SD latent head dim, multiple kv blocks
        (1, 200, 130, 3, 16),    # ragged: both dims padded
        (2, 128, 384, 1, 64),    # cross-shape
    ],
)
def test_flash_pallas_backward_matches_xla(b, sq, sk, h, d):
    """dq/dk/dv from the Pallas backward kernels (interpret mode) vs XLA
    autodiff, with a non-trivial cotangent."""
    keys = jax.random.split(jax.random.PRNGKey(42), 4)
    q = jax.random.normal(keys[0], (b, sq, h, d))
    k = jax.random.normal(keys[1], (b, sk, h, d))
    v = jax.random.normal(keys[2], (b, sk, h, d))
    g = jax.random.normal(keys[3], (b, sq, h, d))

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, None, 128, 128, True) * g)

    def loss_xla(q, k, v):
        return jnp.sum(xla_attention(q, k, v) * g)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), rtol=2e-4, atol=2e-4,
            err_msg=f"d{name} mismatch",
        )


def test_attention_dispatch_cpu_uses_xla():
    q = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 2, 16))
    out = attention(q, q, q)
    ref = xla_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5)


def test_group_norm_matches_direct_computation():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 64))
    scale = jax.random.normal(jax.random.PRNGKey(1), (64,)) * 0.1 + 1.0
    bias = jax.random.normal(jax.random.PRNGKey(2), (64,)) * 0.1

    out = group_norm(x, scale, bias, num_groups=32)

    # oracle: per-(batch,group) normalization
    xn = np.asarray(x, dtype=np.float64).reshape(2, 64, 32, 2)
    mean = xn.mean(axis=(1, 3), keepdims=True)
    var = xn.var(axis=(1, 3), keepdims=True)
    xn = (xn - mean) / np.sqrt(var + 1e-5)
    expected = xn.reshape(2, 8, 8, 64) * np.asarray(scale) + np.asarray(bias)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_group_norm_silu_kernel_matches_xla():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 16, 128))
    scale = jnp.ones((128,)) * 1.3
    bias = jnp.ones((128,)) * -0.2
    ref = group_norm(x, scale, bias, num_groups=32, silu=True)
    out = group_norm_silu(x, scale, bias, num_groups=32, use_kernel=True, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_group_norm_bf16_stats_in_fp32():
    # constant-offset bf16 input: fp32 stats must recover ~zero mean exactly
    x = (jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 64)) + 100.0).astype(
        jnp.bfloat16
    )
    out = group_norm(x, jnp.ones((64,)), jnp.zeros((64,)), num_groups=8)
    assert abs(float(out.astype(jnp.float32).mean())) < 0.05


def test_gn_stats_kernel_matches_einsum():
    """The Pallas stats pass (interpret mode) must match the XLA moments."""
    import jax
    import jax.numpy as jnp

    from ddpo_tpu.ops.groupnorm import _group_onehot, _group_stats

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 256)) + 0.3
    g = 32
    stats = _group_stats(x, g, interpret=True)
    assert stats is not None
    sums, sq_sums = stats
    onehot = _group_onehot(256, g, jnp.float32)
    ref_sums = jnp.einsum("nsc,cg->ng", x, onehot)
    ref_sq = jnp.einsum("nsc,cg->ng", x * x, onehot)
    np.testing.assert_allclose(np.asarray(sums), np.asarray(ref_sums), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(sq_sums), np.asarray(ref_sq), rtol=1e-4)


def test_group_norm_gradients_match_reshape_formulation():
    """custom-VJP moments path == autodiff through the naive formulation."""
    import jax
    import jax.numpy as jnp

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 4, 64)) + 0.2
    scale = jnp.ones((64,)) * 1.1
    bias = jnp.zeros((64,)) + 0.05

    def loss_ours(x):
        return (group_norm(x, scale, bias, num_groups=8, silu=True) ** 2).sum()

    def loss_naive(x):
        xf = x.astype(jnp.float32).reshape(2, -1, 8, 8)
        mean = xf.mean(axis=(1, 3), keepdims=True)
        var = xf.var(axis=(1, 3), keepdims=True)
        xn = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(x.shape)
        out = xn * scale + bias
        out = out * jax.nn.sigmoid(out)
        return (out ** 2).sum()

    g1 = jax.grad(loss_ours)(x)
    g2 = jax.grad(loss_naive)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-3, atol=1e-4)
