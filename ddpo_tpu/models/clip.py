"""First-party CLIP text encoder (prompt conditioning) and vision tower.

Replaces transformers' FlaxCLIPTextModel (used by the reference at
pipeline_flax_stable_diffusion.py:148-161 and pipeline/policy_gradient.py:
185-187) and the FlaxCLIPModel image tower used by reward callbacks
(training/callbacks.py:61-104).

The parameter tree matches transformers' Flax naming
(text_model.encoder.layers.<i>.self_attn.q_proj, ...), which gives us both
(a) direct transplant of HF checkpoints and (b) a numerics oracle: tests
initialize transformers' FlaxCLIPTextModel and run our module with its params.

SD-1.4 text encoder: CLIP ViT-L/14 text tower — vocab 49408, hidden 768,
12 layers, 12 heads, 77 positions, quick_gelu, causal attention.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from ddpo_tpu.ops import xla_attention


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5


SD14_TEXT = CLIPTextConfig()


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_layers: int = 24
    num_heads: int = 16
    projection_dim: int = 768
    layer_norm_eps: float = 1e-5


VIT_L_14 = CLIPVisionConfig()

# openai/clip-vit-base-patch32 — the model the reference's consistency reward
# uses (reference training/callbacks.py:125-128); aesthetic uses ViT-L/14.
VIT_B_32 = CLIPVisionConfig(
    image_size=224, patch_size=32, hidden_size=768, intermediate_size=3072,
    num_layers=12, num_heads=12, projection_dim=512,
)
B32_TEXT = CLIPTextConfig(
    hidden_size=512, intermediate_size=2048, num_layers=12, num_heads=8
)


def quick_gelu(x):
    return x * nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    num_heads: int
    causal: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        head_dim = d // self.num_heads
        b, s, _ = x.shape

        q = nn.Dense(d, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(d, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(d, dtype=self.dtype, name="v_proj")(x)

        q = q.reshape(b, s, self.num_heads, head_dim)
        k = k.reshape(b, s, self.num_heads, head_dim)
        v = v.reshape(b, s, self.num_heads, head_dim)

        if self.causal:
            scale = head_dim**-0.5
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            ) * scale
            mask = jnp.tril(jnp.ones((s, s), dtype=bool))
            logits = jnp.where(mask[None, None], logits, -1e10)
            weights = nn.softmax(logits, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        else:
            out = xla_attention(q, k, v)

        out = out.reshape(b, s, d)
        return nn.Dense(d, dtype=self.dtype, name="out_proj")(out)


class CLIPMLP(nn.Module):
    intermediate_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        x = nn.Dense(self.intermediate_size, dtype=self.dtype, name="fc1")(x)
        x = quick_gelu(x)
        return nn.Dense(d, dtype=self.dtype, name="fc2")(x)


class CLIPEncoderLayer(nn.Module):
    num_heads: int
    intermediate_size: int
    causal: bool
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm1")(x)
        x = x + CLIPAttention(
            self.num_heads, self.causal, dtype=self.dtype, name="self_attn"
        )(h)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="layer_norm2")(x)
        x = x + CLIPMLP(self.intermediate_size, dtype=self.dtype, name="mlp")(h)
        return x


class CLIPLayerCollection(nn.Module):
    num_layers: int
    num_heads: int
    intermediate_size: int
    causal: bool
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = CLIPEncoderLayer(
                self.num_heads, self.intermediate_size, self.causal, self.eps,
                dtype=self.dtype, name=str(i),
            )(x)
        return x


class CLIPEncoder(nn.Module):
    num_layers: int
    num_heads: int
    intermediate_size: int
    causal: bool
    eps: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return CLIPLayerCollection(
            self.num_layers, self.num_heads, self.intermediate_size,
            self.causal, self.eps, dtype=self.dtype, name="layers",
        )(x)


class CLIPTextModel(nn.Module):
    """input_ids (B, 77) -> last_hidden_state (B, 77, hidden)."""

    config: CLIPTextConfig = SD14_TEXT
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config

        class _Embeddings(nn.Module):
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, ids):
                tok = nn.Embed(
                    cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                    name="token_embedding",
                )(ids)
                pos_ids = jnp.arange(ids.shape[1])[None]
                pos = nn.Embed(
                    cfg.max_position_embeddings, cfg.hidden_size, dtype=self.dtype,
                    name="position_embedding",
                )(pos_ids)
                return tok + pos

        class _TextModel(nn.Module):
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, ids):
                x = _Embeddings(dtype=self.dtype, name="embeddings")(ids)
                x = CLIPEncoder(
                    cfg.num_layers, cfg.num_heads, cfg.intermediate_size,
                    causal=True, eps=cfg.layer_norm_eps, dtype=self.dtype,
                    name="encoder",
                )(x)
                x = nn.LayerNorm(
                    epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                    name="final_layer_norm",
                )(x)
                return x

        return _TextModel(dtype=self.dtype, name="text_model")(input_ids)


class CLIPVisionEmbeddings(nn.Module):
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pix):
        cfg = self.config
        b = pix.shape[0]
        x = jnp.transpose(pix, (0, 2, 3, 1)).astype(self.dtype)
        x = nn.Conv(
            cfg.hidden_size,
            (cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            use_bias=False,
            dtype=self.dtype,
            name="patch_embedding",
        )(x)
        x = x.reshape(b, -1, cfg.hidden_size)
        cls = self.param(
            "class_embedding",
            nn.initializers.normal(0.02),
            (cfg.hidden_size,),
            jnp.float32,
        )
        cls = jnp.broadcast_to(cls.astype(self.dtype), (b, 1, cfg.hidden_size))
        x = jnp.concatenate([cls, x], axis=1)
        n_pos = (cfg.image_size // cfg.patch_size) ** 2 + 1
        pos = nn.Embed(
            n_pos, cfg.hidden_size, dtype=self.dtype, name="position_embedding"
        )(jnp.arange(n_pos)[None])
        return x + pos


class CLIPVisionTransformer(nn.Module):
    """pixel_values (B, 3, 224, 224) -> pooled CLS embedding (B, hidden).

    Matches transformers FlaxCLIPVisionTransformer: patch conv (no bias), CLS
    token, learned positions, pre-LN ("pre_layrnorm", sic) transformer,
    post-LN pooled output.
    """

    config: CLIPVisionConfig = VIT_L_14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = CLIPVisionEmbeddings(cfg, dtype=self.dtype, name="embeddings")(pixel_values)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="pre_layrnorm"
        )(x)
        x = CLIPEncoder(
            cfg.num_layers, cfg.num_heads, cfg.intermediate_size,
            causal=False, eps=cfg.layer_norm_eps, dtype=self.dtype, name="encoder",
        )(x)
        pooled = x[:, 0]
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.dtype, name="post_layernorm"
        )(pooled)


class CLIPImageEncoder(nn.Module):
    """Vision tower + projection = CLIPModel.get_image_features.

    Param tree matches FlaxCLIPModel's vision half: {vision_model, visual_projection}.
    Used by the aesthetic/consistency/symmetry reward models
    (training/callbacks.py:61-104 in the reference).
    """

    config: CLIPVisionConfig = VIT_L_14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values: jnp.ndarray) -> jnp.ndarray:
        pooled = CLIPVisionTransformer(self.config, dtype=self.dtype, name="vision_model")(
            pixel_values
        )
        return nn.Dense(
            self.config.projection_dim, use_bias=False, dtype=self.dtype,
            name="visual_projection",
        )(pooled)
