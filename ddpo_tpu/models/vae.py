"""First-party SD-1.4 VAE (AutoencoderKL): pixels <-> latents.

Replaces diffusers' FlaxAutoencoderKL, used by the reference for decode
(pipeline/policy_gradient.py:174-182), encode (training/callbacks.py:37-57),
and the RWR posterior sample (training/diffusion.py:19-23 via
FlaxDiagonalGaussianDistribution).

Architecture (SD-1.4 VAE config): block_out_channels (128, 256, 512, 512),
2 layers per encoder block / 3 per decoder block, single-head spatial
attention in both mid blocks, latent_channels 4 (8 moments), scaling factor
0.18215 applied by callers. NHWC internally; NCHW at the API boundary
(reference contract: latents are (B, 4, H/8, W/8), images (B, 3, H, W)).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddpo_tpu.models.layers import (
    Downsample2D,
    GroupNorm,
    ResnetBlock2D,
    Upsample2D,
    VAESelfAttention,
)


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    scaling_factor: float = 0.18215


SD14_VAE = VAEConfig()


class DiagonalGaussian:
    """Posterior q(z|x) from concatenated (mean, logvar) moments.

    Mirrors diffusers' FlaxDiagonalGaussianDistribution semantics used at
    training/diffusion.py:19-23 (moments stored channel-last in the RWR
    dataset: (..., 8) -> mean (..., 4), logvar (..., 4), logvar clipped to
    [-30, 20]).
    """

    def __init__(self, moments: jnp.ndarray, axis: int = -1):
        self.mean, logvar = jnp.split(moments, 2, axis=axis)
        self.logvar = jnp.clip(logvar, -30.0, 20.0)
        self.std = jnp.exp(0.5 * self.logvar)

    def sample(self, key: jax.Array) -> jnp.ndarray:
        return self.mean + self.std * jax.random.normal(
            key, self.mean.shape, dtype=self.mean.dtype
        )

    def mode(self) -> jnp.ndarray:
        return self.mean


class MidBlock(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock2D(
            self.channels, use_time_emb=False, dtype=self.dtype, name="resnets_0"
        )(x)
        x = VAESelfAttention(dtype=self.dtype, name="attentions_0")(x)
        x = ResnetBlock2D(
            self.channels, use_time_emb=False, dtype=self.dtype, name="resnets_1"
        )(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):  # NHWC image in [-1, 1]
        cfg = self.config
        x = nn.Conv(
            cfg.block_out_channels[0], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(x)

        class _Down(nn.Module):
            out_ch: int
            n_layers: int
            downsample: bool
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, h):
                for j in range(self.n_layers):
                    h = ResnetBlock2D(
                        self.out_ch, use_time_emb=False, dtype=self.dtype,
                        name=f"resnets_{j}",
                    )(h)
                if self.downsample:
                    # VAE encoder uses asymmetric (0,1) padding before the
                    # stride-2 conv (diffusers FlaxDownsample2D w/ pad=0 + pad op)
                    h = Downsample2D(
                        self.out_ch, dtype=self.dtype, asymmetric_pad=True,
                        name="downsamplers_0",
                    )(h)
                return h

        n = len(cfg.block_out_channels)
        for i, out_ch in enumerate(cfg.block_out_channels):
            x = _Down(
                out_ch, cfg.layers_per_block, i < n - 1, self.dtype,
                name=f"down_blocks_{i}",
            )(x)

        x = MidBlock(cfg.block_out_channels[-1], dtype=self.dtype, name="mid_block")(x)
        x = GroupNorm(silu=True, name="conv_norm_out")(x)
        x = nn.Conv(
            2 * cfg.latent_channels, (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_out",
        )(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):  # NHWC latents
        cfg = self.config
        x = nn.Conv(
            cfg.block_out_channels[-1], (3, 3), padding=((1, 1), (1, 1)),
            dtype=self.dtype, name="conv_in",
        )(z)
        x = MidBlock(cfg.block_out_channels[-1], dtype=self.dtype, name="mid_block")(x)

        class _Up(nn.Module):
            out_ch: int
            n_layers: int
            upsample: bool
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, h):
                for j in range(self.n_layers):
                    h = ResnetBlock2D(
                        self.out_ch, use_time_emb=False, dtype=self.dtype,
                        name=f"resnets_{j}",
                    )(h)
                if self.upsample:
                    h = Upsample2D(self.out_ch, dtype=self.dtype, name="upsamplers_0")(h)
                return h

        reversed_channels = list(reversed(cfg.block_out_channels))
        n = len(reversed_channels)
        for i, out_ch in enumerate(reversed_channels):
            x = _Up(
                out_ch, cfg.layers_per_block + 1, i < n - 1, self.dtype,
                name=f"up_blocks_{i}",
            )(x)

        x = GroupNorm(silu=True, name="conv_norm_out")(x)
        x = nn.Conv(
            cfg.out_channels, (3, 3), padding=((1, 1), (1, 1)), dtype=self.dtype,
            name="conv_out",
        )(x)
        return x


class AutoencoderKL(nn.Module):
    """encode: image NCHW -> moments NCHW (8ch); decode: latent NCHW -> image."""

    config: VAEConfig = SD14_VAE
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.config, dtype=self.dtype)
        self.decoder = Decoder(self.config, dtype=self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="quant_conv",
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), dtype=self.dtype,
            name="post_quant_conv",
        )

    def encode(self, sample: jnp.ndarray) -> jnp.ndarray:
        """NCHW image in [-1,1] -> NCHW moments (2*latent_channels)."""
        x = jnp.transpose(sample, (0, 2, 3, 1)).astype(self.dtype)
        moments = self.quant_conv(self.encoder(x))
        return jnp.transpose(moments, (0, 3, 1, 2)).astype(jnp.float32)

    def decode(self, latents: jnp.ndarray) -> jnp.ndarray:
        """NCHW latents (unscaled) -> NCHW image in [-1,1]."""
        z = jnp.transpose(latents, (0, 2, 3, 1)).astype(self.dtype)
        image = self.decoder(self.post_quant_conv(z))
        return jnp.transpose(image, (0, 3, 1, 2)).astype(jnp.float32)

    def __call__(self, sample: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        moments = self.encode(sample)
        z = DiagonalGaussian(moments, axis=1).sample(key)
        return self.decode(z)
