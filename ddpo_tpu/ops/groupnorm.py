"""GroupNorm (+ fused SiLU) for NHWC feature maps.

GroupNorm -> SiLU -> Conv is the repeated pattern in every SD ResNet block
(the reference gets it from diffusers' FlaxResnetBlock2D; SURVEY.md 2.11).
Implemented with float32 statistics regardless of activation dtype, plus a
Pallas TPU kernel that fuses normalization, affine, and SiLU in one VMEM pass
for feature maps small enough to tile on-chip (all UNet latent resolutions).

The XLA path is the oracle; the kernel is validated against it in tests via
interpret mode.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def group_norm(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    silu: bool = False,
) -> jnp.ndarray:
    """GroupNorm over an NHWC (or N...C) tensor; stats in float32."""
    orig_dtype = x.dtype
    n, *spatial, c = x.shape
    # clamp groups for narrow layers (tiny test configs); SD uses c % 32 == 0
    g = num_groups if c % num_groups == 0 else math.gcd(c, num_groups)
    xf = x.astype(jnp.float32).reshape(n, -1, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, *spatial, c)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype)


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups, eps, silu):
    """One batch element: x_ref (1, S, C) in VMEM; stats per group in fp32.

    Group reductions are expressed as matmuls against a (C, G) channel->group
    one-hot matrix (Mosaic does not support reshapes that move data across
    lanes, and the MXU makes these reductions effectively free).
    """
    x = x_ref[0].astype(jnp.float32)  # (S, C)
    s, c = x.shape
    gsize = c // num_groups

    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 0) // gsize
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, num_groups), 1)
    onehot = (ch_group == group_ids).astype(jnp.float32)  # (C, G)

    denom = float(s * gsize)
    sums = jnp.dot(x, onehot, preferred_element_type=jnp.float32)  # (S, G)
    mean_g = jnp.sum(sums, axis=0, keepdims=True) / denom  # (1, G)
    sq_sums = jnp.dot(x * x, onehot, preferred_element_type=jnp.float32)
    var_g = jnp.sum(sq_sums, axis=0, keepdims=True) / denom - mean_g**2

    # broadcast group stats back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, onehot.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(
        jax.lax.rsqrt(var_g + eps), onehot.T, preferred_element_type=jnp.float32
    )
    out = (x - mean_c) * rstd_c
    out = out * scale_ref[0].astype(jnp.float32) + bias_ref[0].astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


# feature maps larger than this stay on the XLA path. The kernel holds ~4
# fp32 copies of the block in VMEM (input, f32 cast, squares, output), and
# scoped VMEM is 16MB/core, so cap the raw block at 3MB.
_VMEM_BUDGET_BYTES = 3 * 1024 * 1024


def group_norm_silu(
    x: jnp.ndarray,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    num_groups: int = 32,
    eps: float = 1e-5,
    use_kernel: Optional[bool] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused GroupNorm+SiLU. Kernel on TPU when the map fits VMEM, else XLA."""
    n, *spatial, c = x.shape
    s = 1
    for d in spatial:
        s *= d
    if use_kernel is None:
        on_tpu = jax.default_backend() in ("tpu", "axon")
        fits = (
            s * c * 4 <= _VMEM_BUDGET_BYTES
            and c % 128 == 0
            and c % num_groups == 0
            and s % 8 == 0
        )
        use_kernel = on_tpu and fits
    if not use_kernel:
        return group_norm(x, scale, bias, num_groups, eps, silu=True)

    xf = x.reshape(n, s, c)
    kernel = functools.partial(
        _gn_silu_kernel, num_groups=num_groups, eps=eps, silu=True
    )
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, s, c), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(xf, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(x.shape)
