from ddpo_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    local_shard,
    jit_concat,
)
from ddpo_tpu.parallel.sequence import sequence_parallel_attention
from ddpo_tpu.parallel.sharding import unet_partition_rules, shard_params
from ddpo_tpu.parallel.spatial import make_spatial_unet_apply

__all__ = [
    "MeshConfig",
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "local_shard",
    "jit_concat",
    "sequence_parallel_attention",
    "make_spatial_unet_apply",
    "unet_partition_rules",
    "shard_params",
]
