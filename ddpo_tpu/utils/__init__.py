from ddpo_tpu.utils import filesystem as fs
from ddpo_tpu.utils.imagenet import imagenet_classes, imagenet_colors
from ddpo_tpu.utils.loaders import load_lines, load_general_prompts
from ddpo_tpu.utils.logger import init_logging
from ddpo_tpu.utils.maskers import (
    Percentile,
    StreamingAverage,
    StreamingPercentile,
    Threshold,
    make_masker,
)
from ddpo_tpu.utils.timer import Timer
from ddpo_tpu.utils.progress import Progress, Silent
from ddpo_tpu.utils.images import encode_jpeg, decode_jpeg, save_image, save_images

__all__ = [
    "fs",
    "imagenet_classes",
    "imagenet_colors",
    "load_lines",
    "load_general_prompts",
    "init_logging",
    "Percentile",
    "StreamingAverage",
    "StreamingPercentile",
    "Threshold",
    "make_masker",
    "Timer",
    "Progress",
    "Silent",
    "encode_jpeg",
    "decode_jpeg",
    "save_image",
    "save_images",
]
