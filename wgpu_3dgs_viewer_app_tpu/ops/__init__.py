from .binning import TileConfig, TileLists, build_tile_lists, gather_entries
from .composite import (
    composite_tiles,
    composite_tiles_jnp,
    composite_tiles_pallas,
    over_background,
)
from .preprocess import PreprocessOut, preprocess
from .rasterize_ref import rasterize_reference

__all__ = [
    "TileConfig",
    "TileLists",
    "build_tile_lists",
    "gather_entries",
    "composite_tiles",
    "composite_tiles_jnp",
    "composite_tiles_pallas",
    "over_background",
    "PreprocessOut",
    "preprocess",
    "rasterize_reference",
]
