"""Model-stack tests: shapes, jit, grads, and a transformers CLIP oracle.

diffusers is not available in this environment, so the UNet/VAE are validated
by structural invariants (shape, determinism, grad flow, param count at SD
scale) on tiny configs; the CLIP text encoder is validated numerically against
transformers' FlaxCLIPTextModel with transplanted parameters.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpo_tpu.models import (
    AutoencoderKL,
    CLIPTextConfig,
    CLIPTextModel,
    DiagonalGaussian,
    UNet2DCondition,
    UNetConfig,
    VAEConfig,
)

TINY_UNET = UNetConfig(
    sample_size=8,
    block_out_channels=(32, 64),
    layers_per_block=1,
    attention_heads=2,
    cross_attention_dim=32,
    down_block_has_attn=(True, False),
)

TINY_VAE = VAEConfig(block_out_channels=(16, 32), layers_per_block=1)


@pytest.fixture(scope="module")
def tiny_unet():
    model = UNet2DCondition(TINY_UNET)
    x = jnp.zeros((2, 4, 8, 8))
    t = jnp.array([0, 10])
    ctx = jnp.zeros((2, 7, 32))
    params = jax.jit(model.init)(jax.random.PRNGKey(0), x, t, ctx)["params"]
    return model, params


def test_unet_output_shape_and_determinism(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 8, 8))
    t = jnp.array([981, 1])
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 32))
    out1 = model.apply({"params": params}, x, t, ctx)
    out2 = jax.jit(lambda p, x, t, c: model.apply({"params": p}, x, t, c))(
        params, x, t, ctx
    )
    assert out1.shape == (2, 4, 8, 8)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), rtol=1e-5, atol=1e-5)


def test_unet_timestep_sensitivity(tiny_unet):
    """Different timesteps must give different eps predictions."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))
    o1 = model.apply({"params": params}, x, jnp.array([1]), ctx)
    o2 = model.apply({"params": params}, x, jnp.array([981]), ctx)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-4


def test_unet_context_sensitivity(tiny_unet):
    """Cross-attention must actually read the text context."""
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    c1 = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))
    c2 = jax.random.normal(jax.random.PRNGKey(3), (1, 7, 32))
    o1 = model.apply({"params": params}, x, jnp.array([500]), c1)
    o2 = model.apply({"params": params}, x, jnp.array([500]), c2)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-4


def test_unet_gradients_flow(tiny_unet):
    model, params = tiny_unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 8, 8))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 32))

    def loss(p):
        return (model.apply({"params": p}, x, jnp.array([500]), ctx) ** 2).mean()

    grads = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(np.abs(np.asarray(g)).sum() > 0 for g in leaves)
    assert nonzero > len(leaves) * 0.9  # essentially every param participates


def test_unet_sd14_param_count():
    """SD-1.4 UNet has ~860M params; structural check of the full config.

    Uses eval_shape so no giant buffers are materialized on CPU.
    """
    model = UNet2DCondition()
    x = jax.ShapeDtypeStruct((1, 4, 64, 64), jnp.float32)
    t = jax.ShapeDtypeStruct((1,), jnp.int32)
    ctx = jax.ShapeDtypeStruct((1, 77, 768), jnp.float32)
    variables = jax.eval_shape(model.init, jax.random.PRNGKey(0), x, t, ctx)
    n = sum(
        np.prod(v.shape) for v in jax.tree_util.tree_leaves(variables["params"])
    )
    assert abs(n / 1e6 - 859.5) < 5, f"unexpected UNet param count: {n/1e6:.1f}M"


def test_vae_roundtrip_shapes():
    model = AutoencoderKL(TINY_VAE)
    img = jax.random.normal(jax.random.PRNGKey(0), (1, 3, 16, 16))
    params = jax.jit(model.init)(jax.random.PRNGKey(1), img, jax.random.PRNGKey(2))["params"]

    moments = model.apply({"params": params}, img, method=model.encode)
    assert moments.shape == (1, 8, 8, 8)  # 2x downsample (2 blocks), 8 moments

    z = DiagonalGaussian(moments, axis=1).sample(jax.random.PRNGKey(3))
    assert z.shape == (1, 4, 8, 8)
    recon = model.apply({"params": params}, z, method=model.decode)
    assert recon.shape == (1, 3, 16, 16)


def test_vae_sd14_param_count():
    model = AutoencoderKL()
    img = jax.ShapeDtypeStruct((1, 3, 64, 64), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = jax.eval_shape(model.init, key, img, key)
    n = sum(
        np.prod(v.shape) for v in jax.tree_util.tree_leaves(variables["params"])
    )
    assert abs(n / 1e6 - 83.7) < 3, f"unexpected VAE param count: {n/1e6:.1f}M"


def test_diagonal_gaussian_matches_reference_semantics():
    """moments -> (mean, clipped logvar); sample = mean + std * N(0,1)."""
    moments = jnp.concatenate(
        [jnp.full((2, 4, 2, 2), 3.0), jnp.full((2, 4, 2, 2), -50.0)], axis=1
    )
    dist = DiagonalGaussian(moments, axis=1)
    np.testing.assert_allclose(np.asarray(dist.mean), 3.0)
    np.testing.assert_allclose(np.asarray(dist.logvar), -30.0)  # clip
    s = dist.sample(jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(s), 3.0, atol=1e-4)  # tiny std


def test_clip_text_matches_transformers():
    """Numerics oracle: run our text encoder with HF-initialized params."""
    transformers = pytest.importorskip("transformers")
    hf_cfg = transformers.CLIPTextConfig(
        vocab_size=100,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=16,
        hidden_act="quick_gelu",
    )
    hf_model = transformers.FlaxCLIPTextModel(hf_cfg, seed=0)

    ours = CLIPTextModel(
        CLIPTextConfig(
            vocab_size=100,
            hidden_size=32,
            intermediate_size=64,
            num_layers=2,
            num_heads=4,
            max_position_embeddings=16,
        )
    )
    ids = jax.random.randint(jax.random.PRNGKey(0), (2, 16), 0, 100)
    hf_out = hf_model(ids, params=hf_model.params)[0]
    our_out = ours.apply({"params": hf_model.params}, ids)
    np.testing.assert_allclose(
        np.asarray(our_out), np.asarray(hf_out), rtol=1e-4, atol=1e-5
    )
