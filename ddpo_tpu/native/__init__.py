from ddpo_tpu.native.jpeg import jpeg_sizes_native, jpeg_sizes

__all__ = ["jpeg_sizes_native", "jpeg_sizes"]
