from ddpo_tpu.ops.attention import attention, xla_attention, flash_attention
from ddpo_tpu.ops.groupnorm import group_norm, group_norm_silu

__all__ = [
    "attention",
    "xla_attention",
    "flash_attention",
    "group_norm",
    "group_norm_silu",
]
