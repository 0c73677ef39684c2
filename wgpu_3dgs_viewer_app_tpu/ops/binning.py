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


# Entries per packed row == VPU lane width. Each chunk the compositor
# consumes is exactly one row of every field plane.
ROW = 128

# Field-plane order in the packed entry tensor.
PLANE_FIELDS = ("mean_x", "mean_y", "conic_a", "conic_b", "conic_c", "alpha", "r", "g", "b")
N_PLANES = len(PLANE_FIELDS)


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class EntryPlanes:
    """TPU-native sorted entry storage.

    Mosaic wants HBM slices 128-lane aligned, so entries are packed 128 per
    row with each splat field on its own plane:

        ent (9, R, 128) f32 — planes mx, my, A, B, C, alpha, r, g, b

    and every tile's run starts on a row boundary (runs padded to a multiple
    of 128 with zero-alpha entries). A compositor chunk = one (9, 1, 128)
    row DMA, always aligned.
    """

    ent: jnp.ndarray          # (9, R, 128) f32
    row_starts: jnp.ndarray   # (n_tiles,) i32 — first packed row of each tile
    tile_counts: jnp.ndarray  # (n_tiles,) i32 — live entries per tile

    def tree_flatten(self):
        return ((self.ent, self.row_starts, self.tile_counts), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_entry_planes(pre: PreprocessOut, lists: TileLists, cfg: TileConfig) -> EntryPlanes:
    """Gather sorted splat data into the 128-aligned field-plane layout."""
    e = lists.sorted_idx.shape[0]
    n_tiles = cfg.n_tiles
    counts = lists.tile_counts
    aligned_counts = ((counts + ROW - 1) // ROW) * ROW
    aligned_starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(aligned_counts)]
    ).astype(jnp.int32)  # (n_tiles + 1,)

    # Static capacity: every tile may need up to ROW-1 padding entries.
    e_al = ((e + ROW - 1) // ROW) * ROW + ROW * n_tiles
    n_rows = e_al // ROW

    # Tile ownership is resolved per *row* (every tile's run is row-aligned),
    # keeping the expensive per-slot work to two large gathers.
    row_ids = jnp.arange(n_rows, dtype=jnp.int32)
    row_t = jnp.clip(
        jnp.searchsorted(aligned_starts // ROW, row_ids, side="right").astype(jnp.int32) - 1,
        0,
        n_tiles - 1,
    )
    # Per-row offsets into the unaligned sorted-entry array.
    row_delta = (lists.tile_starts - aligned_starts[:-1])[row_t]  # (n_rows,)
    row_end = (lists.tile_starts + counts)[row_t]

    j = row_ids[:, None] * ROW + jnp.arange(ROW, dtype=jnp.int32)[None, :]
    src_slot = j + row_delta[:, None]
    live = (src_slot < row_end[:, None]).reshape(-1)
    src_slot = jnp.clip(src_slot.reshape(-1), 0, e - 1)
    src = jnp.where(live, lists.sorted_idx[src_slot], 0)

    # Per-field 1D gathers: multi-column gathers force lane-padded layouts on
    # TPU (a (E, 9) gather materializes with ~57x padding); 1D gathers don't.
    alpha_g = jnp.where(live, pre.alpha[src], 0.0)  # dead slots: exact no-ops
    planes = [
        pre.mean2d[:, 0][src],
        pre.mean2d[:, 1][src],
        pre.conic[:, 0][src],
        pre.conic[:, 1][src],
        pre.conic[:, 2][src],
        alpha_g,
        pre.rgb[:, 0][src],
        pre.rgb[:, 1][src],
        pre.rgb[:, 2][src],
    ]
    ent = jnp.stack(planes, axis=0).reshape(N_PLANES, e_al // ROW, ROW)
    return EntryPlanes(
        ent=ent,
        row_starts=aligned_starts[:-1] // ROW,
        tile_counts=counts,
    )
