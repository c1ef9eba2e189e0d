"""Whole-UNet spatial sharding: H split over an 'sp' mesh axis, halo comms.

Round 2's sp sharded only the self-attention (each attention call runs in
its own shard_map; every conv between attentions computes REPLICATED over
the sp axis — no conv comms, but also no conv speedup: sp devices repeat
the full conv FLOPs, and the param-grad reduction pays an extra sp-axis
all-reduce). This module instead runs the ENTIRE UNet forward inside ONE
shard_map with the latent's H dimension sharded over the sp axis, the
classic TPU "spatial partitioning" scheme for large-image convs — dividing
the conv FLOPs by sp. Compile-measured HLO collective bytes at 512px on a
dp4xsp2 mesh (bench_sp_comms.py, round 4 — this is why sp_mode="spatial"
is the shipped default): train step sp-axis traffic 441 MB vs the
attention mode's 3582 MB (8.1x), forward 193 vs 203 MB (~equal), and the
whole-mesh param-grad all-reduce collapses to ONE 3.28 GB op instead of
separate dp- and sp-axis reductions.

  - 3x3 convs exchange a single boundary row with each H neighbor
    (ops/spatial.halo_exchange_rows — ~2.6 MB/layer at SD-1.4 512px);
  - stride-2 downsamples fetch only the previous shard's last row;
  - GroupNorm psums its per-(batch, group) moment partial sums;
  - self-attention all-gathers K/V over the axis (exact softmax on local
    queries); cross-attention context is replicated — no comms.

Every collective used (ppermute / psum / all_gather) has an exact
transpose, so the same sharded forward serves PPO training: wrap the
returned apply with jax.checkpoint and grad() exactly like the unsharded
one. Beyond-reference capability: the reference (jannerm/ddpo) has no
model-parallel axis at all — it pmaps over batch only
(pipeline/policy_gradient.py:223-464).

Composition contract: the returned apply is a shard_map over the FULL mesh,
so it must be called from the GSPMD/auto level (a plain jit), never from
inside another shard_map. The driver therefore uses the plain
`sample_trajectories` scan (batch sharded over dp via NamedSharding) with
this apply, not `sample_trajectories_sharded`. Mutually exclusive with
tp>1 and with ops.set_attention_sharding (which shard_maps internally).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

from jax.sharding import Mesh, PartitionSpec as P

from ddpo_tpu.ops.spatial import validate_spatial_geometry
from ddpo_tpu.parallel.mesh import shard_map_compat


def make_spatial_unet_apply(
    mesh: Mesh,
    unet,
    axis: str = "sp",
    batch_axis: Optional[str] = "dp",
) -> Callable[[Any, Any, Any, Any], Any]:
    """Build unet_apply(params, sample, t, context) with H sharded over axis.

    unet: an (unsharded) models.UNet2DCondition instance — it is cloned
    with spatial_axis=axis, which changes only the compute path (halo
    convs, psum GroupNorm, gather attention); the param tree is identical,
    so checkpoints, the SD-1.4 manifest, and the optimizer state are all
    unaffected.

    sample is NCHW (B, C, H, W) per the reference contract; H (dim 2) is
    sharded over `axis`, batch over `batch_axis` (pass None for a batch
    replicated over dp). Params are replicated; their gradients psum over
    the mesh automatically through the shard_map transpose.
    """
    unet_sp = unet.clone(spatial_axis=axis)
    n = mesh.shape[axis]
    levels = len(unet.config.block_out_channels) - 1

    def local(p, x, t, ctx):
        return unet_sp.apply({"params": p}, x, t, ctx)

    spec_x = P(batch_axis, None, axis)
    fn = shard_map_compat(
        local,
        mesh,
        in_specs=(P(), spec_x, P(batch_axis), P(batch_axis)),
        out_specs=spec_x,
    )

    def apply(p, sample, t, ctx):
        validate_spatial_geometry(sample.shape[2], axis, n, levels=levels)
        return fn(p, sample, t, ctx)

    return apply
