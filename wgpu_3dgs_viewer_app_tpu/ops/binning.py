"""Tile binning + depth sort: the TPU equivalent of the crate's `RadixSorter`
(driven at reference `src/tab/scene.rs:865-869`) fused with tile-list
construction for the compositor.

GPU 3DGS sorts (depth, splat) pairs and lets hardware blending handle pixel
order. A TPU has no ROP units, so we take the tile-binned design: each
surviving splat is duplicated into every screen tile its 3-sigma rect touches
(static duplication factor D — XLA static shapes; SURVEY §7 hard-part (3)),
keyed by

    key(u32) = tile_id << DEPTH_BITS | monotonic_f32_bits(depth) >> (32 - DEPTH_BITS)

One ascending `lax.sort` then yields, per tile, a front-to-back splat run;
`searchsorted` recovers the per-tile [start, count) ranges (the TPU analog of
the crate's dispatch-indirect args buffer, `src/tab/scene.rs:867-868`).

IEEE-754 trick: positive f32 bit patterns are monotonic in value, so the top
DEPTH_BITS of the raw bits order by depth without a normalize pass.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from .preprocess import PreprocessOut


@dataclasses.dataclass(frozen=True)
class TileConfig:
    """Static screen/tiling geometry (part of the jit specialization key)."""

    width: int
    height: int
    tile: int = 16  # tile side in pixels
    max_dup: int = 8  # max duplicated tile entries per splat (D)

    @property
    def tiles_x(self) -> int:
        return -(-self.width // self.tile)

    @property
    def tiles_y(self) -> int:
        return -(-self.height // self.tile)

    @property
    def n_tiles(self) -> int:
        return self.tiles_x * self.tiles_y

    @property
    def tile_bits(self) -> int:
        # +1 so the sentinel bucket (all-ones tile) sorts after every real tile.
        return max(1, (self.n_tiles + 1 - 1).bit_length())

    @property
    def depth_bits(self) -> int:
        return 32 - self.tile_bits


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class TileLists:
    """Sorted duplicated entries + per-tile ranges."""

    sorted_idx: jnp.ndarray    # (N*D,) i32 splat index per entry (depth-major per tile)
    sorted_keys: jnp.ndarray   # (N*D,) u32
    tile_starts: jnp.ndarray   # (n_tiles,) i32 start offset of each tile's run
    tile_counts: jnp.ndarray   # (n_tiles,) i32 entries per tile
    n_valid: jnp.ndarray       # () i32 total live entries

    def tree_flatten(self):
        return (
            (self.sorted_idx, self.sorted_keys, self.tile_starts, self.tile_counts, self.n_valid),
            None,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def depth_key_bits(depth: jnp.ndarray, depth_bits: int) -> jnp.ndarray:
    """Positive-f32 depth -> monotonic top `depth_bits` integer key (u32)."""
    bits = jax.lax.bitcast_convert_type(jnp.maximum(depth, 0.0), jnp.uint32)
    return bits >> jnp.uint32(32 - depth_bits)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_tile_lists(pre: PreprocessOut, cfg: TileConfig) -> TileLists:
    """Duplicate splats into touched tiles, sort, and slice per-tile runs."""
    n = pre.mean2d.shape[0]
    tile = float(cfg.tile)
    ntx, nty = cfg.tiles_x, cfg.tiles_y

    # Tile rect touched by each splat's radius (inclusive bounds, clamped).
    x, y, r = pre.mean2d[:, 0], pre.mean2d[:, 1], pre.radius
    tx0 = jnp.clip(jnp.floor((x - r) / tile), 0, ntx - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + r) / tile), 0, ntx - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - r) / tile), 0, nty - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + r) / tile), 0, nty - 1).astype(jnp.int32)
    rw = tx1 - tx0 + 1
    rh = ty1 - ty0 + 1
    n_touched = rw * rh  # splats touching > max_dup tiles get truncated (see cfg)

    dkey = depth_key_bits(pre.depth, cfg.depth_bits)
    valid = pre.valid

    # Enumerate up to D duplicates per splat: j -> (j % rw, j // rw) offset.
    j = jnp.arange(cfg.max_dup, dtype=jnp.int32)[None, :]  # (1, D)
    dx = j % rw[:, None]
    dy = j // rw[:, None]
    tile_id = (ty0[:, None] + dy) * ntx + (tx0[:, None] + dx)  # (N, D)
    live = valid[:, None] & (j < n_touched[:, None]) & (dy < rh[:, None])

    sentinel = jnp.uint32(0xFFFFFFFF)
    keys = jnp.where(
        live,
        (tile_id.astype(jnp.uint32) << jnp.uint32(cfg.depth_bits)) | dkey[:, None],
        sentinel,
    ).reshape(-1)
    payload = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, cfg.max_dup)
    ).reshape(-1)

    sorted_keys, sorted_idx = jax.lax.sort((keys, payload), num_keys=1, is_stable=True)

    boundaries = (
        jnp.arange(cfg.n_tiles + 1, dtype=jnp.uint32) << jnp.uint32(cfg.depth_bits)
    )
    edges = jnp.searchsorted(sorted_keys, boundaries, side="left").astype(jnp.int32)
    tile_starts = edges[:-1]
    tile_counts = edges[1:] - edges[:-1]
    n_valid = jnp.sum(live.astype(jnp.int32))
    return TileLists(
        sorted_idx=sorted_idx,
        sorted_keys=sorted_keys,
        tile_starts=tile_starts,
        tile_counts=tile_counts,
        n_valid=n_valid,
    )


def gather_entries(pre: PreprocessOut, lists: TileLists, pad_multiple: int = 128) -> jnp.ndarray:
    """Gather per-entry packed splat data in sorted order.

    Returns (E_padded, 8) f32: [mx, my, conicA, conicB, conicC, r, g, b] with
    alpha folded separately? No — layout is
    [mx, my, A, B, C, alpha, ...rgb packed below]; see PACKED_* indices.

    Packed row layout (f32 x 8):
      0: mean_x  1: mean_y  2: conic_A  3: conic_B  4: conic_C
      5: alpha   6..8 would overflow — rgb stored in a second (E, 4) array.

    To keep DMA rows 128-lane friendly the compositor consumes two arrays:
      geom (E, 8):  mx, my, A, B, C, alpha, 0, 0
      color (E, 4): r, g, b, 0
    """
    idx = lists.sorted_idx
    e = idx.shape[0]
    # Always leave at least one full chunk of zero-alpha slack so the
    # compositor's fixed-size chunk loads never run off the end.
    pad = ((-e) % pad_multiple) + pad_multiple
    geom = jnp.concatenate(
        [
            pre.mean2d,
            pre.conic,
            pre.alpha[:, None],
            jnp.zeros((pre.alpha.shape[0], 2), jnp.float32),
        ],
        axis=1,
    )
    color = jnp.concatenate(
        [pre.rgb, jnp.zeros((pre.rgb.shape[0], 1), jnp.float32)], axis=1
    )
    geom_s = jnp.take(geom, idx, axis=0)
    color_s = jnp.take(color, idx, axis=0)
    if pad:
        geom_s = jnp.concatenate([geom_s, jnp.zeros((pad, 8), jnp.float32)])
        color_s = jnp.concatenate([color_s, jnp.zeros((pad, 4), jnp.float32)])
    return geom_s, color_s
