"""ctypes bridge to the gsnative C++ codec (native/gsnative.cpp).

`pack_gaussians_native` is a drop-in fused replacement for
`compression.pack_gaussians`'s numpy path: one multithreaded C pass doing
color/opacity quantization, SH reorder + compression, and cov3d construction.
Falls back to None when the library isn't built (build with
`python -m wgpu_3dgs_viewer_app_tpu.native.build`).
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

from .compression import Compressions, Cov3dCompression, ShCompression
from .gaussian import Gaussians

_LIB_PATH = Path(__file__).parent.parent / "native" / "libgsnative.so"
_lib = None

_SH_MODE = {
    ShCompression.SINGLE: 0,
    ShCompression.HALF: 1,
    ShCompression.NORM8: 2,
    ShCompression.REMOVE: 3,
}
_COV_MODE = {Cov3dCompression.SINGLE: 0, Cov3dCompression.HALF: 1}


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.gs_pack.argtypes = [
        ctypes.c_void_p,  # records
        ctypes.c_int64,   # n
        ctypes.c_void_p,  # pos (3, N)
        ctypes.c_void_p,  # color0 (N,) u32
        ctypes.c_int,     # sh_mode
        ctypes.c_void_p,  # sh_out (45, N)
        ctypes.c_void_p,  # sh_mn (N,)
        ctypes.c_void_p,  # sh_span (N,)
        ctypes.c_int,     # cov_mode
        ctypes.c_void_p,  # cov_out (6, N)
        ctypes.c_int,     # n_threads
    ]
    lib.gs_pack.restype = None
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def pack_gaussians_native(g: Gaussians, comp: Compressions, n_threads: int = 0) -> Optional[dict]:
    """Fused native pack; returns None if the library isn't built."""
    lib = _load()
    if lib is None:
        return None
    n = g.count
    records = np.ascontiguousarray(g.to_pod_records()).view("<f4").reshape(n, 62)
    pos = np.empty((3, n), np.float32)
    color0 = np.empty(n, np.uint32)
    sh_mode = _SH_MODE[comp.sh]
    cov_mode = _COV_MODE[comp.cov3d]
    sh_mn = np.empty(n, np.float32) if comp.sh == ShCompression.NORM8 else None
    sh_span = np.empty(n, np.float32) if comp.sh == ShCompression.NORM8 else None
    if comp.sh == ShCompression.SINGLE:
        sh_out = np.empty((45, n), np.float32)
    elif comp.sh == ShCompression.HALF:
        sh_out = np.empty((45, n), np.float16)
    elif comp.sh == ShCompression.NORM8:
        sh_out = np.empty((45, n), np.uint8)
    else:
        sh_out = None
    cov_out = np.empty((6, n), np.float32 if cov_mode == 0 else np.float16)

    def ptr(a):
        return a.ctypes.data_as(ctypes.c_void_p) if a is not None else None

    lib.gs_pack(
        ptr(records), n, ptr(pos), ptr(color0),
        sh_mode, ptr(sh_out), ptr(sh_mn), ptr(sh_span),
        cov_mode, ptr(cov_out), n_threads,
    )
    out = {"pos": pos, "color0": color0, "cov3d": cov_out}
    if sh_out is not None:
        out["sh"] = sh_out
    if sh_mn is not None:
        out["sh_mn"] = sh_mn
        out["sh_span"] = sh_span
    return out
