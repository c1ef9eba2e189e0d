from ddpo_tpu.ops.attention import (
    attention,
    flash_attention,
    set_attention_sharding,
    set_flash_enabled,
    xla_attention,
)
from ddpo_tpu.ops.conv import (
    conv3x3_direct,
    conv3x3_xla,
    set_conv_kernel_enabled,
)
from ddpo_tpu.ops.groupnorm import (
    group_norm,
    group_norm_silu,
    set_gn_stats_kernel_enabled,
)
from ddpo_tpu.ops.quant import conv3x3_w8a8, quantize_symmetric

__all__ = [
    "attention",
    "xla_attention",
    "flash_attention",
    "set_attention_sharding",
    "set_flash_enabled",
    "conv3x3_direct",
    "conv3x3_xla",
    "set_conv_kernel_enabled",
    "set_gn_stats_kernel_enabled",
    "conv3x3_w8a8",
    "quantize_symmetric",
    "group_norm",
    "group_norm_silu",
]
