"""First-party SD-1.4 conditional UNet (the DDPO policy network, ~860M params).

Replaces diffusers' FlaxUNet2DConditionModel, which the reference calls at
pipeline_flax_stable_diffusion.py:219-224 (sampling) and
training/policy_gradient.py:87-102 / training/diffusion.py:54-76 (training).

TPU-first design:
  - NHWC internally (native conv layout); the public API accepts NCHW to keep
    the reference's tensor contract (latents are (B, 4, H/8, W/8)).
  - activation dtype configurable (bfloat16 for sampling/benchmark, float32
    for bit-parity testing); params always float32.
  - attention via ddpo_tpu.ops.attention (Pallas flash kernel for the 4096-
    token latent self-attention), GroupNorm+SiLU fused.
  - pure module: apply(params, x, t, context) -> eps; no mutable state.

Architecture (SD-1.4 / v1.5 UNet config):
  block_out_channels (320, 640, 1280, 1280), layers_per_block 2,
  8 attention heads at every resolution, cross_attention_dim 768,
  down: CrossAttn x3 + plain, mid: CrossAttn, up: plain + CrossAttn x3.

Param tree naming mirrors HF diffusers Flax (down_blocks_0.resnets_0.conv1,
mid_block.attentions_0.transformer_blocks_0.attn1.to_q, ...) so SD-1.4
checkpoints transplant via ddpo_tpu/models/convert.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ddpo_tpu.models.layers import (
    Conv3x3,
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    TimestepEmbedding,
    Transformer2D,
    Upsample2D,
    timestep_embedding,
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    sample_size: int = 64
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    attention_heads: int = 8
    cross_attention_dim: int = 768
    # which down blocks carry cross-attention transformers (True) vs plain
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    freq_shift: float = 0.0


SD14_UNET = UNetConfig()


class DownBlock2D(nn.Module):
    """layers_per_block resnets (+ optional transformers) and a downsampler.

    Returns the block output plus every intermediate residual for the skip
    connections (diffusers CrossAttnDownBlock2D / DownBlock2D semantics).
    """

    out_channels: int
    num_layers: int
    heads: int
    has_attn: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None
    quant: bool = False  # W8A8 int8 resnet/upsampler convs (inference)

    @nn.compact
    def __call__(self, x, temb, context):
        residuals = []
        for j in range(self.num_layers):
            x = ResnetBlock2D(
                self.out_channels, dtype=self.dtype,
                spatial_axis=self.spatial_axis, quant=self.quant,
                name=f"resnets_{j}"
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, self.out_channels // self.heads, dtype=self.dtype,
                    spatial_axis=self.spatial_axis, name=f"attentions_{j}",
                )(x, context)
            residuals.append(x)
        if self.add_downsample:
            x = Downsample2D(
                self.out_channels, dtype=self.dtype,
                spatial_axis=self.spatial_axis, name="downsamplers_0",
            )(x)
            residuals.append(x)
        return x, residuals


class UpBlock2D(nn.Module):
    """num_layers resnets over concat(skip, x) (+ transformers, + upsample)."""

    out_channels: int
    num_layers: int
    heads: int
    has_attn: bool
    add_upsample: bool
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, residuals, temb, context):
        for j in range(self.num_layers):
            x = jnp.concatenate([x, residuals.pop()], axis=-1)
            x = ResnetBlock2D(
                self.out_channels, dtype=self.dtype,
                spatial_axis=self.spatial_axis, quant=self.quant,
                name=f"resnets_{j}"
            )(x, temb)
            if self.has_attn:
                x = Transformer2D(
                    self.heads, self.out_channels // self.heads, dtype=self.dtype,
                    spatial_axis=self.spatial_axis, name=f"attentions_{j}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(
                self.out_channels, dtype=self.dtype,
                spatial_axis=self.spatial_axis, quant=self.quant,
                name="upsamplers_0",
            )(x)
        return x


class MidBlock2D(nn.Module):
    channels: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x, temb, context):
        sp = self.spatial_axis
        x = ResnetBlock2D(
            self.channels, dtype=self.dtype, spatial_axis=sp,
            quant=self.quant, name="resnets_0"
        )(x, temb)
        x = Transformer2D(
            self.heads, self.channels // self.heads, dtype=self.dtype,
            spatial_axis=sp, name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(
            self.channels, dtype=self.dtype, spatial_axis=sp,
            quant=self.quant, name="resnets_1"
        )(x, temb)
        return x


class UNet2DCondition(nn.Module):
    """spatial_axis: run with H sharded over that mesh axis — the module
    must then be applied INSIDE a shard_map (parallel/spatial.py wraps
    this); convs halo-exchange, GroupNorm psums stats, self-attention
    all-gathers K/V. Identical param tree either way."""

    config: UNetConfig = SD14_UNET
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None
    # W8A8 int8 resnet/upsampler convs on the 2x-rate MXU path, for
    # inference sampling only (ops/quant.py). conv_in/conv_out stay in
    # self.dtype: 4-channel endpoints, negligible FLOPs, and conv_out sets
    # the eps-prediction precision. Identical param tree either way.
    quant: bool = False

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,  # (B, C, H, W) NCHW, reference contract
        timesteps: jnp.ndarray,  # (B,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B, 77, 768)
        train: bool = False,
    ) -> jnp.ndarray:
        cfg = self.config
        del train  # no dropout in the SD-1.4 UNet

        timesteps = jnp.asarray(timesteps)
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))

        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)  # -> NHWC
        context = encoder_hidden_states.astype(self.dtype)
        heads = cfg.attention_heads

        t_emb = timestep_embedding(
            timesteps, cfg.block_out_channels[0], freq_shift=cfg.freq_shift
        )
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(t_emb.astype(self.dtype))

        x = Conv3x3(
            cfg.block_out_channels[0], dtype=self.dtype,
            spatial_axis=self.spatial_axis, name="conv_in",
        )(x)

        residuals = [x]
        n_blocks = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            x, res = DownBlock2D(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block,
                heads=heads,
                has_attn=cfg.down_block_has_attn[i],
                add_downsample=i < n_blocks - 1,
                dtype=self.dtype,
                spatial_axis=self.spatial_axis,
                quant=self.quant,
                name=f"down_blocks_{i}",
            )(x, temb, context)
            residuals.extend(res)

        x = MidBlock2D(
            cfg.block_out_channels[-1], heads, dtype=self.dtype,
            spatial_axis=self.spatial_axis, quant=self.quant,
            name="mid_block",
        )(x, temb, context)

        reversed_channels = list(reversed(cfg.block_out_channels))
        reversed_has_attn = list(reversed(cfg.down_block_has_attn))
        for i, out_ch in enumerate(reversed_channels):
            x = UpBlock2D(
                out_channels=out_ch,
                num_layers=cfg.layers_per_block + 1,
                heads=heads,
                has_attn=reversed_has_attn[i],
                add_upsample=i < n_blocks - 1,
                dtype=self.dtype,
                spatial_axis=self.spatial_axis,
                quant=self.quant,
                name=f"up_blocks_{i}",
            )(x, residuals, temb, context)
        assert not residuals

        x = GroupNorm(
            silu=True, spatial_axis=self.spatial_axis, name="conv_norm_out"
        )(x)
        x = Conv3x3(
            cfg.out_channels, dtype=self.dtype, spatial_axis=self.spatial_axis,
            name="conv_out",
        )(x)
        return jnp.transpose(x, (0, 3, 1, 2)).astype(jnp.float32)  # -> NCHW
