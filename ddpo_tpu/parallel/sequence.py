"""Sequence-parallel (sp) attention over a mesh axis.

Scale-out building block beyond the reference (which has no mesh axes at
all — SURVEY.md 2.12/5.7): shards the query sequence of the UNet's latent
self-attention over an 'sp' mesh axis so >dp-chip meshes can split the
4096-token 64x64 attention. K/V are all-gathered per shard — at SD shapes
one head-batch of K or V is S*D*2B = 320KB bf16, so the gather rides ICI
cheaply while the O(S^2) score work divides across the axis.

GSPMD cannot partition pallas_call operands automatically, which is exactly
why this exists: shard_map hands each device its query shard as a concrete
local array, and the per-device program dispatches through the normal
``ddpo_tpu.ops.attention`` entry point (Pallas flash kernel on TPU, XLA on
CPU test meshes).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P


from ddpo_tpu.parallel.mesh import shard_map_compat as _shard_map


def sequence_parallel_attention(
    mesh: Mesh,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    axis: str = "sp",
    batch_axis: Optional[str] = None,
):
    """Attention with the query sequence sharded over ``axis``.

    q: (B, Sq, H, D), k/v: (B, Sk, H, D) — the ddpo_tpu.ops.attention
    layout. Sq must divide by the axis size. K/V enter sharded along their
    sequence dim and are all-gathered inside the shard (tiled, preserving
    order), so softmax statistics are exact — results match unsharded
    attention to fp tolerance. Pass batch_axis to additionally shard the
    batch dim (composes sp with dp).
    """
    from ddpo_tpu.ops import attention

    def local(q_l, k_l, v_l):
        k_full = jax.lax.all_gather(k_l, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_l, axis, axis=1, tiled=True)
        return attention(q_l, k_full, v_full, scale)

    spec = P(batch_axis, axis)
    return _shard_map(
        local, mesh, in_specs=(spec, spec, spec), out_specs=spec
    )(q, k, v)
