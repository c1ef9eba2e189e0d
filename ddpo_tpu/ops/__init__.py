from ddpo_tpu.ops.attention import (
    attention,
    flash_attention,
    set_flash_enabled,
    xla_attention,
)
from ddpo_tpu.ops.groupnorm import group_norm, group_norm_silu

__all__ = [
    "attention",
    "xla_attention",
    "flash_attention",
    "set_flash_enabled",
    "group_norm",
    "group_norm_silu",
]
