from ddpo_tpu.data.hdf5 import (
    H5Reader,
    H5Writer,
    LocalReader,
    RemoteReader,
    RemoteWriter,
    SlowRemoteReader,
)
from ddpo_tpu.data.bucket import BucketDataset, get_bucket_loader, make_uncond_text

__all__ = [
    "H5Reader",
    "H5Writer",
    "LocalReader",
    "RemoteReader",
    "RemoteWriter",
    "SlowRemoteReader",
    "BucketDataset",
    "get_bucket_loader",
    "make_uncond_text",
]
