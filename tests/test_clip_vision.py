"""CLIP vision tower numerics oracle vs transformers FlaxCLIPVisionModel."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ddpo_tpu.models.clip import (
    CLIPImageEncoder,
    CLIPVisionConfig,
    CLIPVisionTransformer,
)


def test_clip_vision_matches_transformers():
    transformers = pytest.importorskip("transformers")
    if not hasattr(transformers, "FlaxCLIPVisionModel"):
        pytest.skip("transformers without flax vision model")

    hf_cfg = transformers.CLIPVisionConfig(
        image_size=32,
        patch_size=8,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        hidden_act="quick_gelu",
    )
    hf_model = transformers.FlaxCLIPVisionModel(hf_cfg, seed=0)

    ours = CLIPVisionTransformer(
        CLIPVisionConfig(
            image_size=32, patch_size=8, hidden_size=64, intermediate_size=128,
            num_layers=2, num_heads=4,
        )
    )
    pixels = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32, 32))
    hf_out = hf_model(pixels, params=hf_model.params)
    our_pooled = ours.apply({"params": hf_model.params["vision_model"]}, pixels)
    np.testing.assert_allclose(
        np.asarray(our_pooled), np.asarray(hf_out.pooler_output),
        rtol=2e-4, atol=2e-5,
    )


def test_image_encoder_param_tree_shape():
    cfg = CLIPVisionConfig(
        image_size=32, patch_size=8, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, projection_dim=16,
    )
    enc = CLIPImageEncoder(cfg)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), jnp.zeros((1, 3, 32, 32)))["params"]
    assert set(params) == {"vision_model", "visual_projection"}
    out = enc.apply({"params": params}, jnp.zeros((2, 3, 32, 32)))
    assert out.shape == (2, 16)
