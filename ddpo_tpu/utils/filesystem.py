"""Transparent local / gs:// filesystem layer.

Same surface as the reference's ddpo/utils/filesystem.py (open/ls/exists/
save/unpickle/rm/save_json/read_json/get_bucket/join_and_create), with gcsfs
imported lazily so local-only runs work without GCS credentials.
"""

from __future__ import annotations

import json
import os
import pickle
import re
import shutil

builtin_open = open


def _gcs():
    import gcsfs

    return gcsfs.GCSFileSystem()


def is_remote(path: str) -> bool:
    return "gs://" in path


def open(path: str, bucket: str | None = None, mode: str = "rb"):
    if bucket is not None:
        bucket = bucket if bucket.startswith("gs://") else "gs://" + bucket
        path = os.path.join(bucket, path)
    if is_remote(path):
        return _gcs().open(path, mode=mode)
    return builtin_open(path, mode=mode)


def ls(path: str, bucket: str | None = None, strip: bool = True):
    if bucket is not None:
        bucket = bucket if bucket.startswith("gs://") else "gs://" + bucket
        path = os.path.join(bucket, path)
    if is_remote(path):
        paths = sorted(_gcs().ls(path))
        if strip:
            paths = ["/".join(p.split("/")[1:]) for p in paths]
        return paths
    return sorted(os.listdir(path))


def exists(path: str) -> bool:
    if is_remote(path):
        return _gcs().exists(path)
    return os.path.exists(path)


def save(path: str, x) -> None:
    with open(path, mode="wb") as f:
        pickle.dump(x, f)


def unpickle(path: str):
    with open(path, mode="rb") as f:
        return pickle.load(f)


def rm(path: str) -> None:
    assert not is_remote(path)
    shutil.rmtree(path)


def save_json(path: str, x) -> None:
    with open(path, mode="w") as f:
        json.dump(x, f)


def read_json(path: str):
    with open(path, mode="r") as f:
        return json.load(f)


def get_bucket(path: str):
    """Split 'gs://bucket/rest' -> ('bucket', 'rest')."""
    matched = re.match("gs://.+?/", path)
    assert matched is not None, f"expected a gs:// bucket in {path}"
    start, end = matched.span()
    bucket = path[start:end].replace("gs://", "").replace("/", "")
    return bucket, path[end:]


def join_and_create(*args: str) -> str:
    """os.path.join that creates parent directories."""
    path = os.path.join(*args)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    return path


def mkdir(savepath: str, fname: bool = False) -> bool:
    """Create directory (optionally the parent of a file path)."""
    if fname:
        savepath = os.path.split(savepath)[0]
    if savepath and not os.path.exists(savepath):
        os.makedirs(savepath)
        return True
    return False
