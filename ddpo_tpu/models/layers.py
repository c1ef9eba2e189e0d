"""Shared building blocks for the first-party SD-1.4 model stack.

These replace the diffusers/transformers model internals that the reference
imports as pip dependencies (SURVEY.md section 2.11) — the actual FLOPs of the
framework. Everything computes in a configurable activation dtype (bfloat16
on TPU) with float32 parameters and float32 normalization statistics, runs in
NHWC layout (native for TPU convolutions), and routes attention through
ddpo_tpu.ops (Pallas flash attention on long sequences).

Parameter naming follows the HF diffusers Flax conventions (to_q/to_k/to_v/
to_out_0, norm1/conv1/time_emb_proj, ...) so that released SD-1.4 checkpoints
transplant directly; see ddpo_tpu/models/convert.py.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ddpo_tpu.ops import attention as attention_op
from ddpo_tpu.ops.conv import conv3x3
from ddpo_tpu.ops.groupnorm import group_norm, group_norm_silu


class Conv3x3(nn.Module):
    """3x3 stride-1 SAME conv dispatching through ops/conv.py.

    Param tree identical to nn.Conv (HWIO kernel + bias under the same
    module name), so checkpoints and the SD-1.4 manifest are unaffected;
    only the compute path changes (Pallas kernel on TPU at shapes where it
    measured faster than XLA's conv emitter, XLA otherwise).

    spatial_axis: set when the H dim is sharded over a mesh axis inside a
    shard_map (parallel/spatial.py) — the conv halo-exchanges one boundary
    row per neighbor instead of relying on GSPMD gathers.
    """

    features: int
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None
    quant: bool = False  # W8A8 int8 inference path (ops/quant.py)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        x, kernel, bias = nn.dtypes.promote_dtype(
            x, kernel, bias, dtype=self.dtype
        )
        return conv3x3(
            x, kernel, bias, spatial_axis=self.spatial_axis, quant=self.quant
        )

def timestep_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    freq_shift: float = 0.0,
) -> jnp.ndarray:
    """Sinusoidal timestep features, SD convention (cos first).

    timesteps: (B,) int/float -> (B, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / (half - freq_shift)
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP over sinusoidal features (diffusers: time_embedding)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_1")(t_emb)
        x = nn.silu(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="linear_2")(x)
        return x


class GroupNorm(nn.Module):
    """GroupNorm with fp32 stats, optionally fused with SiLU (Pallas on TPU).

    spatial_axis: cross-shard psum of the moment partial sums when the
    spatial dims are sharded over a mesh axis (parallel/spatial.py).
    """

    num_groups: int = 32
    eps: float = 1e-5
    silu: bool = False
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if self.silu:
            return group_norm_silu(
                x, scale, bias, self.num_groups, self.eps,
                spatial_axis=self.spatial_axis,
            )
        return group_norm(
            x, scale, bias, self.num_groups, self.eps,
            spatial_axis=self.spatial_axis,
        )


class ResnetBlock2D(nn.Module):
    """GN+SiLU -> conv -> +time -> GN+SiLU -> conv with 1x1 skip.

    NHWC. Matches SD's FlaxResnetBlock2D topology (output_scale_factor=1).
    """

    out_channels: int
    use_time_emb: bool = True
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        in_channels = x.shape[-1]
        residual = x
        sp = self.spatial_axis

        h = GroupNorm(silu=True, spatial_axis=sp, name="norm1")(x)
        h = Conv3x3(
            self.out_channels, dtype=self.dtype, spatial_axis=sp,
            quant=self.quant, name="conv1",
        )(h)

        if self.use_time_emb and temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype, name="time_emb_proj")(
                nn.silu(temb)
            )
            h = h + t[:, None, None, :]

        h = GroupNorm(silu=True, spatial_axis=sp, name="norm2")(h)
        h = Conv3x3(
            self.out_channels, dtype=self.dtype, spatial_axis=sp,
            quant=self.quant, name="conv2",
        )(h)

        if in_channels != self.out_channels:
            residual = nn.Conv(
                self.out_channels, (1, 1), dtype=self.dtype, name="conv_shortcut"
            )(residual)
        return h + residual


class CrossAttention(nn.Module):
    """Multi-head attention; self-attention when context is None.

    Long-sequence self-attention dispatches to the Pallas flash kernel
    (ddpo_tpu/ops/attention.py); cross-attention over 77 text tokens stays on
    the XLA path.
    """

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        # under spatial sharding, self-attention gathers K/V over the axis
        # (exact softmax on local queries); cross-attention context (77 text
        # tokens) is replicated per shard — nothing to gather
        is_self = context is None
        context = x if context is None else context
        inner = self.heads * self.dim_head
        query_dim = x.shape[-1]

        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, sq, _ = q.shape
        sk = k.shape[1]
        q = q.reshape(b, sq, self.heads, self.dim_head)
        k = k.reshape(b, sk, self.heads, self.dim_head)
        v = v.reshape(b, sk, self.heads, self.dim_head)

        out = attention_op(
            q, k, v, spatial_axis=self.spatial_axis if is_self else None
        )
        out = out.reshape(b, sq, inner)
        return nn.Dense(inner, dtype=self.dtype, name="to_out_0")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP: project to 2*4*dim, gate with GELU, project back."""

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.mult

        class _GEGLU(nn.Module):
            dtype: jnp.dtype

            @nn.compact
            def __call__(self, h):
                h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(h)
                h, gate = jnp.split(h, 2, axis=-1)
                return h * nn.gelu(gate, approximate=False)

        x = _GEGLU(dtype=self.dtype, name="net_0")(x)
        return nn.Dense(self.dim, dtype=self.dtype, name="net_2")(x)


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, each with residual."""

    heads: int
    dim_head: int
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        attn = lambda name: CrossAttention(
            self.heads, self.dim_head, dtype=self.dtype,
            spatial_axis=self.spatial_axis, name=name,
        )
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=name)

        x = attn("attn1")(ln("norm1")(x)) + x
        x = attn("attn2")(ln("norm2")(x), context) + x
        dim = self.heads * self.dim_head
        x = GEGLUFeedForward(dim, dtype=self.dtype, name="ff")(ln("norm3")(x)) + x
        return x


class Transformer2D(nn.Module):
    """Spatial transformer: GN -> 1x1 conv in -> blocks -> 1x1 conv out (+res)."""

    heads: int
    dim_head: int
    depth: int = 1
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(spatial_axis=self.spatial_axis, name="norm")(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        # H-major flatten: a local (h_local, w) shard is a contiguous slice
        # of the global (h*w) sequence, so spatial attention's tiled K/V
        # all-gather reconstructs the exact global token order
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.heads, self.dim_head, dtype=self.dtype,
                spatial_axis=self.spatial_axis,
                name=f"transformer_blocks_{i}",
            )(x, context)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual


class Downsample2D(nn.Module):
    """3x3 stride-2 conv (UNet variant: symmetric padding 1).

    Under spatial sharding the shard fetches only the previous neighbor's
    last row (halo_top_row): with even local H every stride-2 window that
    starts in a shard ends in it, and global SAME padding at even H never
    reads the bottom pad row. Same nn.Conv module/params either way.
    """

    channels: int
    dtype: jnp.dtype = jnp.float32
    asymmetric_pad: bool = False  # VAE encoder uses pad=(0,1) per side
    spatial_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.asymmetric_pad:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = ((0, 0), (0, 0))
        elif self.spatial_axis is not None:
            from ddpo_tpu.ops.spatial import halo_top_row

            x = halo_top_row(x, self.spatial_axis)
            pad = ((0, 0), (1, 1))
        else:
            pad = ((1, 1), (1, 1))
        return nn.Conv(
            self.channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample2D(nn.Module):
    """Nearest 2x upsample + 3x3 conv.

    Nearest-neighbor 2x is shard-local under spatial sharding (output row r
    reads input row r//2, which lives on the same shard); the conv halo-
    exchanges as usual.
    """

    channels: int
    dtype: jnp.dtype = jnp.float32
    spatial_axis: Optional[str] = None
    quant: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return Conv3x3(
            self.channels, dtype=self.dtype, spatial_axis=self.spatial_axis,
            quant=self.quant, name="conv",
        )(x)


class VAESelfAttention(nn.Module):
    """Single-head spatial self-attention used in VAE mid blocks.

    Param names follow diffusers Flax (group_norm/query/key/value/proj_attn).
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(name="group_norm")(x)
        x = x.reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="query")(x)
        k = nn.Dense(c, dtype=self.dtype, name="key")(x)
        v = nn.Dense(c, dtype=self.dtype, name="value")(x)
        out = attention_op(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="proj_attn")(out)
        return out.reshape(b, h, w, c) + residual
