"""Build the gsnative shared library with the system compiler.

Usage: python -m wgpu_3dgs_viewer_app_tpu.native.build
The library lands next to this file as `libgsnative.so`; data/native.py
loads it when present and falls back to numpy otherwise.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

HERE = Path(__file__).parent
SRC = HERE / "gsnative.cpp"
OUT = HERE / "libgsnative.so"


def build(verbose: bool = True) -> Path:
    cmd = [
        "g++",
        "-O3",
        "-march=native",
        "-shared",
        "-fPIC",
        "-std=c++17",
        "-pthread",
        str(SRC),
        "-o",
        str(OUT),
    ]
    if verbose:
        print(" ".join(cmd), file=sys.stderr)
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
