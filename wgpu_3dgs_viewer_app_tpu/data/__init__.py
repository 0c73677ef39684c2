from .compression import (
    ALL_COMPRESSIONS,
    Compressions,
    Cov3dCompression,
    ShCompression,
    pack_gaussians,
    unpack_color0,
    unpack_cov3d,
    unpack_sh,
)
from .gaussian import (
    PLY_GAUSSIAN_POD_DTYPE,
    PLY_GAUSSIAN_POD_SIZE,
    Gaussians,
    inverse_sigmoid,
    sigmoid,
)
from .ply import (
    PlyError,
    PlyHeader,
    bake_edits,
    read_ply,
    read_ply_chunks,
    read_ply_header,
    write_ply,
)
from .synthetic import make_grid_scene, make_random_scene

__all__ = [
    "ALL_COMPRESSIONS",
    "Compressions",
    "Cov3dCompression",
    "ShCompression",
    "pack_gaussians",
    "unpack_color0",
    "unpack_cov3d",
    "unpack_sh",
    "PLY_GAUSSIAN_POD_DTYPE",
    "PLY_GAUSSIAN_POD_SIZE",
    "Gaussians",
    "inverse_sigmoid",
    "sigmoid",
    "PlyError",
    "PlyHeader",
    "bake_edits",
    "read_ply",
    "read_ply_chunks",
    "read_ply_header",
    "write_ply",
    "make_grid_scene",
    "make_random_scene",
]
