from .binning import (
    EntryPlanes,
    TileConfig,
    TileLists,
    build_entry_planes,
    build_tile_lists,
)
from .composite import (
    composite_tiles,
    composite_tiles_jnp,
    composite_tiles_pallas,
    over_background,
)
from .preprocess import PreprocessOut, preprocess
from .rasterize_ref import rasterize_reference

__all__ = [
    "EntryPlanes",
    "TileConfig",
    "TileLists",
    "build_entry_planes",
    "build_tile_lists",
    "composite_tiles",
    "composite_tiles_jnp",
    "composite_tiles_pallas",
    "over_background",
    "PreprocessOut",
    "preprocess",
    "rasterize_reference",
]
