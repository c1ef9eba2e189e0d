"""Build the sizes.pkl manifest for a sampled dataset directory.

Replaces /root/reference/pipeline/save_sizes.py's 100-way python -c
subprocess fan-out with a thread pool opening the split files directly
(h5py reads only metadata here, so threads suffice and errors propagate
instead of dropping into pdb).

Run: python -m ddpo_tpu.pipelines.save_sizes --dataset compressed-animals-rwr
"""

from __future__ import annotations

import os
from concurrent import futures

from ddpo_tpu.utils import fs
from ddpo_tpu.utils.parser import Parser as BaseParser


class Parser(BaseParser):
    config: str = "ddpo_tpu.config.base"
    dataset: str = "compressed_animals_rwr"


def file_size(loadpath: str, fname: str) -> int:
    import h5py

    full = fname if fs.is_remote(fname) else os.path.join(loadpath, fname)
    handle = fs.open(full, mode="rb") if fs.is_remote(full) else full
    with h5py.File(handle, "r") as f:
        field = next(iter(f.keys()))
        return int(f[field].shape[0])


def build_manifest(loadpath: str, max_workers: int = 16) -> dict:
    fnames = [f for f in fs.ls(loadpath) if f.endswith(".hdf5")]
    print(f"[ sizes ] {len(fnames)} files under {loadpath}")
    with futures.ThreadPoolExecutor(max_workers=max_workers) as pool:
        sizes = list(pool.map(lambda f: file_size(loadpath, f), fnames))
    manifest = dict(zip(fnames, sizes))
    print(f"[ sizes ] total {sum(sizes)} entries")
    return manifest


def main(argv=None):
    args = Parser().parse_args("sizes", argv, setup=False)
    loadpath = getattr(args, "override", None) or args.loadpath
    if hasattr(args, "logbase") and not (
        loadpath.startswith("/") or fs.is_remote(loadpath)
    ):
        loadpath = os.path.join(args.logbase, loadpath)
    manifest = build_manifest(loadpath)
    import jax

    if jax.process_index() == 0:
        fs.save(os.path.join(loadpath, "sizes.pkl"), manifest)
    return manifest


if __name__ == "__main__":
    main()
