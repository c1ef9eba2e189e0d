"""Build the native JPEG-reward shared library (g++ + libjpeg).

Compiled on demand into the package directory and cached; rebuilds when the
source is newer than the .so. No pybind11 — plain C ABI consumed via ctypes.
"""

from __future__ import annotations

import os
import subprocess

_DIR = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(_DIR, "jpeg_reward.cc")
LIB = os.path.join(_DIR, "libjpeg_reward.so")


def build(force: bool = False) -> str:
    """Compile (if stale) and return the shared-library path."""
    if (
        not force
        and os.path.exists(LIB)
        and os.path.getmtime(LIB) >= os.path.getmtime(SRC)
    ):
        return LIB
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        SRC, "-o", LIB, "-ljpeg", "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return LIB
