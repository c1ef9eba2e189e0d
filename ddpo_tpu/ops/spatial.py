"""Spatial-sharding primitives: halo exchange + global stats for sp UNets.

The round-3 sp integration shards only the self-attention sequence; every
conv between attentions runs on GSPMD-gathered full feature maps, so the sp
axis pays a full-activation all-gather per conv. These helpers let the
WHOLE UNet forward run inside one shard_map with the latent's H dimension
sharded over the sp axis ("spatial partitioning", the classic TPU scheme
for large-image convs):

  - 3x3 stride-1 SAME convs exchange ONE boundary row with each neighbor
    (`halo_exchange_rows`). `jax.lax.ppermute` fills positions without a
    source with zeros, which is exactly SAME zero-padding at the global
    image edges — so edge shards need no special casing.
  - 3x3 stride-2 downsamples need only the TOP halo row (`halo_top_row`):
    with even local H, every stride-2 window that starts in a shard ends in
    it, and global SAME padding uses only the top pad row (H even).
  - GroupNorm's per-(batch, group) moments are additive over the sequence
    dim, so global stats are one tiny (B, G) psum (`psum_moments`).
  - Self-attention all-gathers K/V over the axis (tiled, order-preserving)
    and computes the exact softmax on local queries — the same math as
    parallel/sequence.py, but usable INSIDE an outer shard_map where
    nesting another shard_map is not possible.

Everything here is a plain function of arrays + a mesh axis NAME: it only
makes sense inside `shard_map` (see parallel/spatial.py for the UNet
wrapper). All ops differentiate: ppermute/all_gather/psum have exact
transposes, so the same sharded forward serves PPO training.

Per-step comms cost at SD-1.4 512px geometry, CFG batch 2B=16, bf16, sp=2:
halos move 2 rows x W x C per conv pair ~= 2*64*320*2B bytes ~ 2.6 MB/layer.
(The earlier "~32x vs a GSPMD-gathered conv path" estimate was against a
hypothetical that never compiles that way: measured HLO shows the
attention-only sp mode keeps convs REPLICATED over sp — its real costs are
duplicated conv FLOPs and an extra sp-axis param-grad all-reduce, 8.1x the
spatial mode's total train-step sp traffic. See bench_sp_comms.py and
parallel/spatial.py's header for the compile-measured numbers.)
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def axis_size(axis: str) -> int:
    """Static size of a shard_map mesh axis (trace-time constant)."""
    return jax.lax.psum(1, axis)


def halo_exchange_rows(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Pad a (B, H_local, W, C) shard with 1 row from each H neighbor.

    Returns (B, H_local + 2, W, C). Edge shards receive zero rows (ppermute
    zero-fills missing sources), matching global SAME zero padding.
    """
    n = axis_size(axis)
    if n == 1:
        return jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)))
    down = [(i, i + 1) for i in range(n - 1)]  # shard i sends to i+1
    up = [(i + 1, i) for i in range(n - 1)]  # shard i+1 sends to i
    top = jax.lax.ppermute(x[:, -1:], axis, down)  # prev shard's last row
    bottom = jax.lax.ppermute(x[:, :1], axis, up)  # next shard's first row
    return jnp.concatenate([top, x, bottom], axis=1)


def halo_top_row(x: jnp.ndarray, axis: str) -> jnp.ndarray:
    """Pad a (B, H_local, W, C) shard with the previous shard's last row.

    For stride-2 SAME 3x3 convs with even H: windows start at global rows
    -1, 1, 3, ... so each shard needs exactly one row from above (zeros for
    shard 0 = the global top pad row); the bottom pad row is never read.
    """
    n = axis_size(axis)
    if n == 1:
        return jnp.pad(x, ((0, 0), (1, 0), (0, 0), (0, 0)))
    down = [(i, i + 1) for i in range(n - 1)]
    top = jax.lax.ppermute(x[:, -1:], axis, down)
    return jnp.concatenate([top, x], axis=1)


def psum_moments(
    sums: jnp.ndarray, sq_sums: jnp.ndarray, axis: str
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """All-reduce per-(batch, group) moment partial sums over the sp axis.

    Returns (global sums, global sq_sums, axis size) — the caller scales
    its local denominator by the axis size.
    """
    return (
        jax.lax.psum(sums, axis),
        jax.lax.psum(sq_sums, axis),
        axis_size(axis),
    )


def gather_kv(
    k: jnp.ndarray, v: jnp.ndarray, axis: str
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """All-gather K/V (B, S_local, H, D) -> (B, S_global, H, D), in order.

    tiled=True concatenates along the sequence dim in axis-index order,
    which matches the H-major flattening of the spatial grid — softmax
    statistics over the gathered sequence are exactly the unsharded ones.
    """
    k_full = jax.lax.all_gather(k, axis, axis=1, tiled=True)
    v_full = jax.lax.all_gather(v, axis, axis=1, tiled=True)
    return k_full, v_full


def validate_spatial_geometry(
    height: int, axis_name: str, axis_n: int, levels: int = 3
) -> None:
    """Check H divides the sp axis at every UNet resolution level.

    height: latent H at the UNet input (e.g. 64 for 512px). levels: number
    of stride-2 downsamples (3 for SD-1.4). Raises with a precise message
    naming the failing level; also enforces even local H wherever a
    downsample happens (the halo_top_row scheme needs it).
    """
    h = height
    for level in range(levels + 1):
        if h % axis_n:
            raise ValueError(
                f"spatial sharding: H={h} at UNet level {level} does not "
                f"divide {axis_name}={axis_n} (input H={height})"
            )
        local = h // axis_n
        if level < levels and local % 2:
            raise ValueError(
                f"spatial sharding: local H={local} at level {level} must "
                f"be even for the stride-2 downsample halo "
                f"({axis_name}={axis_n}, input H={height})"
            )
        h //= 2
