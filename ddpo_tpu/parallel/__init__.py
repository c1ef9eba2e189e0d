from ddpo_tpu.parallel.mesh import (
    MeshConfig,
    create_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from ddpo_tpu.parallel.sequence import sequence_parallel_attention
from ddpo_tpu.parallel.sharding import unet_partition_rules, shard_params

__all__ = [
    "MeshConfig",
    "create_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "sequence_parallel_attention",
    "unet_partition_rules",
    "shard_params",
]
