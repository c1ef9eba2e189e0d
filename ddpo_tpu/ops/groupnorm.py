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
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """GroupNorm over an NHWC (or N...C) tensor; fp32 stats.

    Channel->group reduction is a matmul against a (C, G) one-hot matrix
    instead of a reshape to (..., G, C/G): splitting the channel (lane) dim
    forces a physical relayout of the whole tensor on TPU — profiled at ~25%
    of sampler time — while the one-hot contraction rides the MXU and lets
    the normalize/affine/SiLU chain stay fused and copy-free.

    spatial_axis: mesh axis name when the spatial dims are sharded over it
    inside a shard_map (parallel/spatial.py): the per-(batch, group) moment
    partial sums are psum'd so the statistics are the global ones (the
    moments kernel still computes the local partial sums on-chip).
    """
    orig_dtype = x.dtype
    n, *spatial, c = x.shape
    # clamp groups for narrow layers (tiny test configs); SD uses c % 32 == 0
    g = num_groups if c % num_groups == 0 else math.gcd(c, num_groups)
    gsize = c // g

    xf = x.reshape(n, -1, c)
    s = xf.shape[1]
    denom = float(s * gsize)

    sums, sq_sums = _moments(xf, g)
    if spatial_axis is not None:
        from ddpo_tpu.ops.spatial import psum_moments

        sums, sq_sums, axis_n = psum_moments(sums, sq_sums, spatial_axis)
        denom *= axis_n
    mean_g = sums / denom  # (n, g)
    var_g = sq_sums / denom - mean_g**2

    # broadcast group stats back over channels: (n, g) @ (g, c)
    onehot_f = _group_onehot(c, g, jnp.float32)
    mean_c = (mean_g @ onehot_f.T)[:, None, :]  # (n, 1, c)
    rstd_c = (jax.lax.rsqrt(var_g + eps) @ onehot_f.T)[:, None, :]

    out = (xf.astype(jnp.float32) - mean_c) * rstd_c
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if silu:
        out = out * jax.nn.sigmoid(out)
    return out.astype(orig_dtype).reshape(x.shape)


def _moments_reference(xf: jnp.ndarray, g: int):
    """XLA path: per-(batch, group) first/second moments via one-hot MXU
    matmuls (no lane-splitting reshape)."""
    c = xf.shape[-1]
    onehot = _group_onehot(c, g, xf.dtype)
    sums = jnp.einsum(
        "nsc,cg->ng", xf, onehot, preferred_element_type=jnp.float32
    )
    sq_sums = jnp.einsum(
        "nsc,cg->ng",
        xf.astype(jnp.float32) * xf.astype(jnp.float32),
        onehot.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    return sums, sq_sums


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _moments(xf: jnp.ndarray, g: int):
    """(n, s, c) -> (sums, sq_sums) each (n, g); Pallas single-read pass on
    TPU, XLA einsums elsewhere. custom_vjp because the stats kernel is
    forward-only (GroupNorm is differentiated in every training step)."""
    stats = _group_stats(xf, g)
    if stats is not None:
        return stats
    return _moments_reference(xf, g)


def _moments_fwd(xf, g):
    return _moments(xf, g), xf


def _moments_bwd(g, xf, grads):
    g_sums, g_sq = grads  # (n, g) each
    c = xf.shape[-1]
    onehot = _group_onehot(c, g, jnp.float32)
    # d sums / d x = 1 per (group member); d sq_sums / d x = 2x
    g_per_c = (g_sums @ onehot.T)[:, None, :]  # (n, 1, c)
    g_sq_per_c = (g_sq @ onehot.T)[:, None, :]
    gx = g_per_c + 2.0 * xf.astype(jnp.float32) * g_sq_per_c
    return (gx.astype(xf.dtype),)


_moments.defvjp(_moments_fwd, _moments_bwd)


_STATS_LANES = 128


def _gn_stats_kernel(x_ref, out_ref, *, gsize):
    """Accumulate per-group (sum, sum-of-squares) over spatial blocks.

    x_ref: (1, block_s, C). out_ref: (1, 16, 128) revisited across the
    spatial grid dim — rows 0..7 hold the group sums (replicated), rows
    8..15 the squared sums; lanes beyond the group count stay zero. One
    bf16 read of the feature map; fp32 accumulation on the MXU.
    """
    j = pl.program_id(1)
    x = x_ref[0].astype(jnp.float32)  # (block_s, c)
    c = x.shape[1]

    ch_group = jax.lax.broadcasted_iota(jnp.int32, (c, _STATS_LANES), 0) // gsize
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (c, _STATS_LANES), 1)
    onehot = (ch_group == lane_ids).astype(jnp.float32)  # (c, 128)

    sums = jnp.sum(
        jnp.dot(x, onehot, preferred_element_type=jnp.float32), axis=0
    )
    sq_sums = jnp.sum(
        jnp.dot(x * x, onehot, preferred_element_type=jnp.float32), axis=0
    )
    block = jnp.concatenate(
        [
            jnp.broadcast_to(sums, (8, _STATS_LANES)),
            jnp.broadcast_to(sq_sums, (8, _STATS_LANES)),
        ],
        axis=0,
    )

    @pl.when(j == 0)
    def _():
        out_ref[0] = block

    @pl.when(j > 0)
    def _():
        out_ref[0] += block


_STATS_OVERRIDE: Optional[bool] = None


def set_gn_stats_kernel_enabled(value: Optional[bool]) -> None:
    """Force the Pallas GroupNorm-stats kernel on/off (None = auto).

    Mirrors conv.set_conv_kernel_enabled. False is required for AOT
    topology compiles with GSPMD-sharded operands: Mosaic custom-calls
    cannot be auto-partitioned (the dp shard_map paths are fine — kernels
    there see per-shard shapes)."""
    global _STATS_OVERRIDE
    _STATS_OVERRIDE = value


def _group_stats(xf: jnp.ndarray, g: int, interpret: Optional[bool] = None):
    """(n, s, c) -> (sums (n, g), sq_sums (n, g)) via the stats kernel.

    Returns None when the kernel does not apply (non-TPU backend or
    unfriendly shape); callers fall back to the XLA einsum path.
    """
    n, s, c = xf.shape
    if _STATS_OVERRIDE is False:
        return None
    if interpret is None:
        if _STATS_OVERRIDE is None and jax.default_backend() not in (
            "tpu",
            "axon",
        ):
            return None
        interpret = False
    if g > _STATS_LANES or c % g:
        return None
    # spatial block: <=2MB bf16 per block, divisible into s
    block_s = s
    for candidate in (2048, 1024, 512, 256, 128, 64, 32, 16, 8):
        if s % candidate == 0 and candidate * c * xf.dtype.itemsize <= 2**21:
            block_s = candidate
            break
    if s % block_s or block_s < 8:
        return None

    kernel = functools.partial(_gn_stats_kernel, gsize=c // g)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, 16, _STATS_LANES), jnp.float32),
        grid=(n, s // block_s),
        in_specs=[pl.BlockSpec((1, block_s, c), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, 16, _STATS_LANES), lambda i, j: (i, 0, 0)),
        interpret=interpret,
    )(xf)
    return out[:, 0, :g], out[:, 8, :g]


@functools.lru_cache(maxsize=None)
def _group_onehot_np(c: int, g: int):
    import numpy as np

    gsize = c // g
    onehot = np.zeros((c, g), dtype=np.float32)
    onehot[np.arange(c), np.arange(c) // gsize] = 1.0
    return onehot


def _group_onehot(c: int, g: int, dtype):
    return jnp.asarray(_group_onehot_np(c, g), dtype=dtype)


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
    spatial_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Fused GroupNorm+SiLU. Kernel on TPU when the map fits VMEM, else XLA."""
    if spatial_axis is not None:
        # sharded spatial dims: stats need a cross-shard psum (group_norm)
        return group_norm(
            x, scale, bias, num_groups, eps, silu=True, spatial_axis=spatial_axis
        )
    n, *spatial, c = x.shape
    s = 1
    for d in spatial:
        s *= d
    if use_kernel is None:
        # Measured on TPU v5e (bench_ops.py): XLA's fused groupnorm+silu
        # matches or beats the Pallas kernel at every UNet shape, so the
        # kernel stays opt-in (use_kernel=True) rather than the default.
        use_kernel = False
    if use_kernel:
        fits = (
            s * c * 4 <= _VMEM_BUDGET_BYTES
            and c % 128 == 0
            and c % num_groups == 0
            and s % 8 == 0
        )
        use_kernel = fits
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
