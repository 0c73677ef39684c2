"""Pallas merge sort over packed entry planes — the TPU-native replacement for
the engine crate's GPU radix sorter (reference `src/tab/scene.rs:865-869`).

`jax.lax.sort` with one u32 key + three u32 payload planes costs ~115 ms at
E = 24M on v5e (PERF_NOTES.md). A GPU radix sort does not port — Mosaic has
no per-lane scatter, even in VMEM — so this is a comparison sort shaped to
the VPU:

  Phase 1  `block_sort`: bitonic sort of BLOCK-entry tiles entirely in
           VMEM, tiles ALTERNATING ascending/descending by parity. All
           compare-exchange stages are whole-array ops over multi-tile
           cells: partner values come from lane/sublane rolls + iota masks
           (no gathers anywhere), keys compare in signed-ordinal space
           (no unsigned min/max on the VPU).
  Phase 2  ceil(log2(E/BLOCK)) merge-path merge levels: run pairs are
           always (ascending, descending), so every CHUNK-entry grid cell
           merges [asc piece | desc piece] — bitonic by construction, no
           data reversal anywhere. Rank splits are capacity-based (sorted
           sentinel slack participates as +inf) and found by one batched
           binary search per level in XLA between kernel launches. Cells
           DMA their two ragged pieces at row granularity and realign with
           dynamic rolls. Each level materializes only every output run's
           LIVE rank window rounded to rows — the ~44%-of-E sentinel slack
           from culled duplicate slots drops out of all later levels, and
           runs become ragged (row-aligned starts, data-dependent stored
           lengths, per-pair private spill pads so output DMAs need no
           cross-cell ordering).

The final level can emit the compositor's (R, 4, 128) row-interleaved
layout directly (`interleaved=True`), replacing the XLA interleave pass.

Output contract: live prefix ascending with payloads attached; the tail
(longer than the input — levels append spill pads) is all sentinel keys
with unspecified payloads (never read downstream). Entry order matches
`lax.sort(..., is_stable=False)` up to payload order within equal keys
(ties blend order-independently in the compositor).

Measured at E=24M, 44% sentinels (v5e): 83 ms; 97 ms with no sentinels.
Design dead-ends and platform constants are in PERF_NOTES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SENTINEL = 0xFFFFFFFF  # python int: jnp scalars cannot be captured by kernels

# Phase-1 block: 128 rows x 128 lanes = 16384 entries (105 stages). Bigger
# blocks trade phase-1 stages for one fewer merge level. Hardware sweep
# (scripts/ab_hw.sh, 2026-08-19, post-mixed-layout, headline config 1):
# block_rows 128: 62.8 ms e2e / sort 43.1; 256: 59.4 / 39.3; 512: 59.3 /
# 39.6 — 256 wins (512 ties but costs 2x phase-1 VMEM). 256-row blocks run
# the same mixed (sublane-roll) stage layout as 128 — _block_sort_kernel
# selects mixed for any whole number of 128-row subtiles — plus subtile
# direction bits on rows 7+; the win is one fewer merge level.
# Env override is a BENCH TUNING KNOB for A/B on hardware (read at import;
# all callers derive from BLOCK, so the pipeline stays self-consistent).
import os as _os  # noqa: E402

BLOCK_ROWS = int(_os.environ.get("GS_SORT_BLOCK_ROWS", "256"))
# A non-power-of-two block makes the bitonic network incomplete (silently
# WRONG output); fail loudly at import instead (advisor r2).
assert BLOCK_ROWS >= 8 and (BLOCK_ROWS & (BLOCK_ROWS - 1)) == 0, (
    f"GS_SORT_BLOCK_ROWS must be a power of two >= 8, got {BLOCK_ROWS}"
)
BLOCK = BLOCK_ROWS * LANES


def _roll_lane(x, s):
    return pltpu.roll(x, shift=s % x.shape[1], axis=1)


def _roll_row(x, s):
    return pltpu.roll(x, shift=s % x.shape[0], axis=0)


def _to_ord(k_u32):
    """u32 key -> order-preserving i32 (the VPU has no unsigned min/max)."""
    return jax.lax.bitcast_convert_type(k_u32 ^ jnp.uint32(0x80000000), jnp.int32)


def _from_ord(k_i32):
    return jax.lax.bitcast_convert_type(k_i32, jnp.uint32) ^ jnp.uint32(0x80000000)


def _partner(x, j, lane_iota, row_iota, lane_major: bool = False):
    """Value at index (e ^ j) for every entry e of an (R, 128) tile.

    Entry order: row-major e = row*128 + lane, or — with `lane_major` —
    e = lane*LANES + row' within each 128x128 SUBTILE (higher index bits
    are subtile-row bits). Lane-major matters for throughput: small strides
    become SUBLANE rolls, which the VPU executes ~4x faster than cross-lane
    rolls (measured 0.40 vs 1.56 ps/elem on v5e), and small strides are the
    frequent ones in a bitonic network (77 of 105 stages at 16K blocks).
    Rolls that cross tile boundaries are harmless: the XOR mask never
    selects wrapped values."""
    if lane_major:
        if j < LANES:
            lo = _roll_row(x, -j)
            hi = _roll_row(x, j)
            mask = (row_iota & j) == 0
        else:
            assert j < LANES * LANES, j  # subtile bits ride row-major instead
            jl = j // LANES
            lo = _roll_lane(x, -jl)
            hi = _roll_lane(x, jl)
            mask = (lane_iota & jl) == 0
        return jnp.where(mask, lo, hi), mask
    if j < LANES:
        lo = _roll_lane(x, -j)  # e -> value at e + j
        hi = _roll_lane(x, j)   # e -> value at e - j
        mask = (lane_iota & j) == 0
    else:
        jr = j // LANES
        lo = _roll_row(x, -jr)
        hi = _roll_row(x, jr)
        mask = (row_iota & jr) == 0
    return jnp.where(mask, lo, hi), mask


def _compare_exchange(ops, j, dir_up, lane_iota, row_iota,
                      lane_major: bool = False):
    """One bitonic stage: compare-exchange entries e <-> e^j, ascending where
    dir_up. ops[0] is the key. Ties never swap (payload-consistent)."""
    k = ops[0]
    pk, is_lower = _partner(k, j, lane_iota, row_iota, lane_major)
    # Keep min on the (is_lower == dir_up) side, max on the other; the mask
    # is a per-stage constant. knew != k exactly when the pair swapped
    # (ties: min == max == k -> no swap), so payloads follow with one select.
    want_min = is_lower == dir_up
    knew = jnp.where(want_min, jnp.minimum(k, pk), jnp.maximum(k, pk))
    swap = knew != k
    out = [knew]
    for p in ops[1:]:
        pp, _ = _partner(p, j, lane_iota, row_iota, lane_major)
        out.append(jnp.where(swap, pp, p))
    return out


def _dir_up_mask(krun, lane_iota, row_iota, lane_major: bool = False):
    """Direction mask for run size `krun`: entries whose index bit
    log2(krun) is clear sort ascending.

    Lane-major (per 128x128 subtile, e = lane*LANES + row'): index bits
    0..6 are row-within-subtile bits, bits 7..13 lane bits, and bits >= 14
    subtile-index bits, which live in row bits 7+ (subtiles are 128-row
    aligned) — so krun >= LANES^2 masks on (row_iota & krun >> 7). At
    krun == the full block size the bit is the BLOCK-index parity, giving
    the alternating asc/desc blocks the merge levels consume."""
    if lane_major:
        if krun < LANES:
            return (row_iota & krun) == 0
        if krun < LANES * LANES:
            return (lane_iota & (krun // LANES)) == 0
        return (row_iota & (krun >> 7)) == 0
    if krun < LANES:
        return (lane_iota & krun) == 0
    return (row_iota & (krun // LANES)) == 0


def _block_sort_body(ops, rows: int, block_rows: int = None,
                     layout: str = "row", final_dir_up=None):
    """Bitonic sort of every `block_rows`-row tile of a (rows, 128) array;
    each tile sorts ascending independently. Returns ops.

    Multi-tile vectorization: all stage strides stay < one tile, and the
    XOR-partner mask guarantees wrapped roll values are never selected at
    tile boundaries, so every stage is a whole-(rows, 128) op. This is the
    difference between issue-bound 8-vreg ops per 64-row block (~29 ms at
    24M) and 128-vreg ops (measured below).

    `layout` picks the entry order the compare-exchange network sees:
      * "row":   e = row*128 + lane. Strides < 128 (77 of 105 stages at 16K
                 blocks) are cross-lane rolls — the slow path (~30.8 ms at
                 E=24M).
      * "lane":  e = lane*block_rows + row within each tile; small strides
                 become ~4x-cheaper sublane rolls, large strides cross-lane
                 (30.8 -> 17.5 ms). Caller transposes the OUTPUT (a sorted
                 lane-major tile transposed back IS the row-major ascending
                 tile; a block sort is insensitive to input order).
      * "mixed": row-major in AND out; internally hops between layouts per
                 stride segment so EVERY stage rides a sublane roll (strides
                 >= 128 row-major, < 128 lane-major). ~16 per-tile
                 transposes (~1 ps/elem each) replace the 28 remaining
                 cross-lane stages. Requires square tiles.

    `final_dir_up`: traced bool scalar overriding the FINAL pass direction
    (the whole-tile sort direction). Required when a grid cell holds ONE
    tile — the alternating-parity bit is then the grid index, not a row
    bit (callers pass (program_id & 1) == 0)."""
    block_rows = rows if block_rows is None else block_rows
    n = block_rows * LANES
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)

    def dir_mask(size, lm):
        if size == n and final_dir_up is not None:
            # Uniform per-cell direction: layout-independent broadcast.
            return jnp.broadcast_to(final_dir_up, (rows, LANES))
        return _dir_up_mask(size, lane_iota, row_iota, lm)

    if layout == "mixed":
        assert block_rows % LANES == 0, block_rows
        # Enter lane-major: every stride of the first 7 pass sizes is < 128.
        ops = [_transpose_tiles(o, LANES) for o in ops]
        cur = True
        size = 2
        while size <= n:
            # Direction bit: entry-index bit log2(size) — see the "row"
            # branch below for why size == n yields alternating tiles.
            # The mask is per-pass constant PER LAYOUT (at most 2 variants).
            masks = {}
            j = size // 2
            while j >= 1:
                want = j < LANES
                if want != cur:
                    ops = [_transpose_tiles(o, LANES) for o in ops]
                    cur = want
                if cur not in masks:
                    masks[cur] = dir_mask(size, cur)
                ops = _compare_exchange(ops, j, masks[cur], lane_iota,
                                        row_iota, cur)
                j //= 2
            size *= 2
        return [_transpose_tiles(o, LANES) for o in ops]
    lane_major = layout == "lane"
    size = 2
    while size <= n:
        # Direction bit: entry-index bit log2(size). Within-tile index bits
        # of the global index are exact because tiles are size-aligned. At
        # size == n the bit is the tile-index parity, so tiles come out
        # ALTERNATING asc/desc — exactly what the merge levels consume
        # (bitonic [asc | desc] pairs, no data reversal ever materializes).
        # Requires an even tile count per grid cell (asserted by callers)
        # or a `final_dir_up` override for single-tile cells.
        dir_up = dir_mask(size, lane_major)
        j = size // 2
        while j >= 1:
            ops = _compare_exchange(ops, j, dir_up, lane_iota, row_iota,
                                    lane_major)
            j //= 2
        size *= 2
    return ops


def _transpose_tiles(x, block_rows: int):
    """Per-tile transpose of every (block_rows, LANES) tile of (rows, 128):
    maps lane-major sorted order back to flat row-major entry order.
    Requires block_rows == LANES (square tiles)."""
    assert block_rows == LANES, block_rows
    rows = x.shape[0]
    x3 = x.reshape(rows // block_rows, block_rows, LANES)
    return jnp.swapaxes(x3, 1, 2).reshape(rows, LANES)


# Rows per grid cell (CELL_ROWS / BLOCK_ROWS tiles per cell — 2 at the
# default 256-row blocks): 512 rows keep stage ops at 64 vregs; in+out
# double-buffered cells at 1024 rows overflowed the 16 MB VMEM stack when
# measured round 3 (pre mixed-layout rewrite) — env knob for hardware A/B
# now that pre-sort compaction changed the trade (each extra in-cell merge
# pass deletes one whole HBM merge level).
CELL_ROWS = int(_os.environ.get("GS_SORT_CELL_ROWS", "512"))
assert CELL_ROWS >= 8 and (CELL_ROWS & (CELL_ROWS - 1)) == 0, (
    f"GS_SORT_CELL_ROWS must be a power of two >= 8, got {CELL_ROWS}"
)

# Fuse the first merge level(s) into the phase-1 kernel: the grid cell
# already holds CELL_ROWS/BLOCK_ROWS sorted blocks in VMEM, so merging
# them there costs only the bitonic merge stages (~17 per pass at 512-row
# cells) and deletes the first merge level's ENTIRE round trip — HBM
# write+read of all E slots (~44% of them sentinel slack at the 6M bench:
# the first level is the only one that predates live compaction), the
# split search, and the per-cell piece-DMA machinery. Equivalently: the
# round-3 sweep's 512-row-BLOCK config paid the full 153-stage network per
# block and tied 256; this pays 120 + 17 for the same output geometry.
# Knob is a bench A/B escape hatch.
FUSE_L1 = _os.environ.get("GS_SORT_FUSE_L1", "1") not in ("0", "false")

# Pre-phase-1 sentinel compaction (ops/compact.py): pack live entries into
# a dense prefix so dead blocks skip the bitonic network entirely (~44% of
# phase-1 compute at the 6M bench). Requires entry rows to be a multiple of
# the compaction cell height; the dispatcher falls through cleanly when not.
COMPACT = _os.environ.get("GS_SORT_COMPACT", "1") not in ("0", "false")
from .compact import CROWS as _COMPACT_CROWS  # noqa: E402


def _fused_merge_passes(ops, rows: int, block_rows: int, final_dir_up,
                        lane_iota, row_iota):
    """Bitonic merge passes fusing the cell's `rows/block_rows` sorted
    (alternating asc/desc) tiles into ONE sorted run, in the mixed layout
    (strides >= LANES row-major, < LANES per-subtile lane-major — one
    transpose pair per pass). The last pass sorts the whole cell in
    `final_dir_up`'s direction (grid parity — the cell-size index bit is
    not addressable as a row bit)."""
    mixed = rows % LANES == 0  # per-subtile transposes need square tiles
    size = 2 * block_rows * LANES
    n_out = rows * LANES
    while size <= n_out:
        if size == n_out:
            dm_row = dm_lane = jnp.broadcast_to(final_dir_up, (rows, LANES))
        else:
            dm_row = _dir_up_mask(size, lane_iota, row_iota, False)
            dm_lane = _dir_up_mask(size, lane_iota, row_iota, True)
        j = size // 2
        while j >= (LANES if mixed else 1):
            ops = _compare_exchange(ops, j, dm_row, lane_iota, row_iota, False)
            j //= 2
        if mixed:
            ops = [_transpose_tiles(o, LANES) for o in ops]
            while j >= 1:
                ops = _compare_exchange(ops, j, dm_lane, lane_iota, row_iota,
                                        True)
                j //= 2
            ops = [_transpose_tiles(o, LANES) for o in ops]
        size *= 2
    return ops


def _block_sort_kernel(k_ref, p1_ref, p2_ref, p3_ref,
                       ko_ref, p1o_ref, p2o_ref, p3o_ref,
                       *, rows: int, block_rows: int, fuse: bool = False,
                       live_ref=None):
    layout = "mixed" if block_rows % LANES == 0 else "row"
    # program_id must be read OUTSIDE pl.when bodies (interpret mode lowers
    # them as plain lax.cond, which has no program_id rule) — and only when
    # a grid exists (tests drive single cells with no grid at all).
    if live_ref is not None or rows == block_rows or (fuse and rows > block_rows):
        cell = pl.program_id(0)
        even = (cell % 2) == 0
    else:
        cell = even = None

    def body():
        # Single-block cells (BLOCK_ROWS == CELL_ROWS) read the alternating
        # direction from the grid index instead of a row bit.
        final = even if rows == block_rows else None
        k = k_ref[...]
        if live_ref is not None:
            # Pre-compacted input (ops/compact.py): rows at/after the live
            # prefix are unwritten garbage — mask to sentinel on load.
            riota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
            k = jnp.where(cell * rows + riota < live_ref[0], k,
                          jnp.uint32(SENTINEL))
        ops = [_to_ord(k), p1_ref[...], p2_ref[...], p3_ref[...]]
        ops = _block_sort_body(ops, rows, block_rows, layout=layout,
                               final_dir_up=final)
        if fuse and rows > block_rows:
            lane_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
            row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
            ops = _fused_merge_passes(
                ops, rows, block_rows, even, lane_iota, row_iota,
            )
        ko_ref[...] = _from_ord(ops[0])
        p1o_ref[...], p2o_ref[...], p3o_ref[...] = ops[1:]

    if live_ref is None:
        body()
    else:
        # Cells entirely past the live prefix skip the ~137-stage network
        # — with pre-compaction that is ~44% of phase-1 compute at the 6M
        # bench scene. Their key output must still be all-sentinel for the
        # merge descriptors; payloads of sentinel slots are unspecified by
        # the output contract, so they keep whatever the buffer holds.
        dead = cell * rows >= live_ref[0]

        @pl.when(jnp.logical_not(dead))
        def _():
            body()

        @pl.when(dead)
        def _():
            ko_ref[...] = jnp.full((rows, LANES), SENTINEL, jnp.uint32)


def _plan_block_sort(e: int, fuse_l1: bool | None = None):
    """Static phase-1 geometry for E entries: (pad_blocks, cell_rows,
    run_rows). `run_rows` is the sorted-run granularity phase 1 HANDS TO
    the merge phase — cell_rows when the in-cell merge fusion applies
    (FUSE_L1 and the cell holds >1 block), else BLOCK_ROWS. `fuse_l1`
    overrides the module default (in-process A/B on hardware; tests use
    fuse_l1=False to reach multi-level merge coverage at small sizes —
    with fusion on, anything <= one cell sorts entirely in phase 1)."""
    nblocks = e // BLOCK
    # Alternating tile directions need an even tile count per grid cell
    # (tile parity is read from the cell-local row index). Odd block counts
    # > 1 can't satisfy that for any cell size — pad one all-sentinel block
    # (sorted trivially; block parities unchanged).
    pad_blocks = nblocks % 2 if nblocks > 1 else 0
    rows_run = e // LANES + pad_blocks * BLOCK_ROWS
    cell_rows = min(CELL_ROWS, rows_run)
    # Ragged tail: fall back to one cell per block row-count if not divisible.
    while rows_run % cell_rows:
        cell_rows //= 2
    if cell_rows % (2 * BLOCK_ROWS) and nblocks > 1:
        # Odd block count per cell can't read tile parity from a row bit;
        # single-block cells read it from the grid index instead
        # (_block_sort_kernel's final_dir_up). Also the BLOCK_ROWS ==
        # CELL_ROWS case (512-row blocks).
        cell_rows = BLOCK_ROWS
    assert cell_rows % (2 * BLOCK_ROWS) == 0 or nblocks == 1 \
        or cell_rows == BLOCK_ROWS, (e, cell_rows)
    want_fuse = FUSE_L1 if fuse_l1 is None else fuse_l1
    fuse = want_fuse and cell_rows > BLOCK_ROWS and nblocks > 1
    run_rows = cell_rows if fuse else BLOCK_ROWS
    return pad_blocks, cell_rows, run_rows


@functools.partial(jax.jit, static_argnames=("interpret", "fuse_l1"))
def block_sort(keys, p1, p2, p3, interpret: bool = False,
               fuse_l1: bool | None = None, live_rows=None):
    """Sort the flat (E,) operands into runs of `_plan_block_sort(E)`'s
    run_rows granularity (BLOCK-entry bitonic tiles, plus the in-cell merge
    fusion when enabled), runs alternating asc/desc by parity.

    Returns (keys, p1, p2, p3) run-sorted plus (nruns,) live counts (an XLA
    reduction — sentinels have sunk to each ascending run's tail / desc
    run's head). E must be a multiple of BLOCK (the enum stage already pads
    with sentinel slots). NOTE: with an odd block count the returned planes
    are one pad block LONGER than the input — fused runs cannot be sliced
    (live entries sort throughout the run), and the merge phase drops the
    slack anyway.
    """
    e = keys.shape[0]
    assert e % BLOCK == 0, e
    rows_total = e // LANES
    pad_blocks, cell_rows, run_rows = _plan_block_sort(e, fuse_l1)
    fuse = run_rows != BLOCK_ROWS
    rows_run = rows_total + pad_blocks * BLOCK_ROWS

    def spec():
        return pl.BlockSpec((cell_rows, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def prep(a, fill):
        a = a.reshape(rows_total, LANES)
        if pad_blocks:
            pad = jnp.full((pad_blocks * BLOCK_ROWS, LANES), fill, jnp.uint32)
            a = jnp.concatenate([a, pad], axis=0)
        return a

    ins = (prep(keys, SENTINEL), prep(p1, 0), prep(p2, 0), prep(p3, 0))
    if live_rows is None:
        outs = pl.pallas_call(
            functools.partial(_block_sort_kernel, rows=cell_rows,
                              block_rows=BLOCK_ROWS, fuse=fuse),
            grid=(rows_run // cell_rows,),
            in_specs=[spec() for _ in range(4)],
            out_specs=[spec() for _ in range(4)],
            out_shape=[jax.ShapeDtypeStruct((rows_run, LANES), jnp.uint32)] * 4,
            interpret=interpret,
        )(*ins)
    else:
        # Pre-compacted input (ops/compact.py): the live-prefix height rides
        # scalar prefetch; dead cells skip the sort network, boundary cells
        # mask their garbage tail to sentinels on load. Dead cells also skip
        # their HBM traffic: the input index_map pins them to block 0 and
        # the output index_map to the last block (consecutive repeats of the
        # same block index elide the pipeline copies), so the dead region of
        # the OUTPUT stays unwritten garbage — run counts below mask it to
        # zero, and zero-stored runs are never read by the merge phase.
        def kernel(live_ref, *refs):
            return _block_sort_kernel(*refs, rows=cell_rows,
                                      block_rows=BLOCK_ROWS, fuse=fuse,
                                      live_ref=live_ref)

        ncells_g = rows_run // cell_rows

        def in_spec():
            return pl.BlockSpec(
                (cell_rows, LANES),
                lambda i, live: (jnp.where(i * cell_rows < live[0], i, 0), 0),
                memory_space=pltpu.VMEM)

        def out_spec():
            return pl.BlockSpec(
                (cell_rows, LANES),
                lambda i, live: (jnp.where(i * cell_rows < live[0], i,
                                           ncells_g - 1), 0),
                memory_space=pltpu.VMEM)

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ncells_g,),
            in_specs=[in_spec() for _ in range(4)],
            out_specs=[out_spec() for _ in range(4)],
        )
        outs = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[jax.ShapeDtypeStruct((rows_run, LANES), jnp.uint32)] * 4,
            interpret=interpret,
        )(jnp.reshape(live_rows, (1,)).astype(jnp.int32), *ins)
    if fuse and pad_blocks:
        # Pad rows participate in their fused run; keep them (see docstring).
        ks, s1, s2, s3 = outs
    else:
        ks, s1, s2, s3 = (a[:rows_total] for a in outs)
    counts = block_live_counts(ks, run_rows)
    if live_rows is not None:
        # Runs whose cells were skipped hold unwritten garbage (see the
        # index_map redirection above) — force their counts to zero; the
        # level-1 descriptor tightening then gives them stored == 0 and the
        # merge phase never touches their data.
        nruns = counts.shape[0]
        run_starts = jnp.arange(nruns, dtype=jnp.int32) * run_rows
        counts = jnp.where(run_starts < live_rows, counts, 0)
    return ks, s1, s2, s3, counts


# ---------------------------------------------------------------------------
# Phase 2: compacted merge-path merge levels.
#
# After phase 1 the array is BLOCK-entry runs, alternating asc/desc by run
# parity, each a live region plus sorted-out sentinel slack (~44% of E at
# the 6M bench scene). Rather than merging full-capacity runs, every level
# materializes only each output run's LIVE rank window, rounded up to
# 128-entry rows — so level 1 onward operates on ~live-sized data (the
# compaction falls out of the merge itself; no separate pass):
#
#   * ASC output runs store merged ranks [0, ceil(live/128)*128) — all live
#     plus <=127 tail sentinels.
#   * DESC output runs store ranks [cap - stored, cap) of the top-rank
#     order — <=127 HEAD sentinels plus all live (the skipped top ranks are
#     all sentinel because cap - stored <= input slack).
#
# Runs therefore become RAGGED (row-aligned starts, data-dependent stored
# lengths). All rank arithmetic is capacity-based with capacity := stored
# size, so sentinels participate as ordinary +inf values. Per level:
#
#   * XLA (`_ragged_level_meta`): pair arithmetic on (nruns,) arrays, one
#     batched merge-path binary search for every cell boundary, DMA (row,
#     delta) coordinates, and output row offsets (exclusive cumsum plus a
#     private CHUNK_ROWS spill pad per pair, so no two cells ever write
#     overlapping rows). Grid size must be static, so it is sized for the
#     worst case and surplus cells no-op (always a suffix of the grid).
#   * Kernel (`_merge_kernel`): double-buffered piece DMA in, cyclic-shift
#     realignment (dynamic rolls), [asc piece | desc piece] concatenation
#     (bitonic by construction; rank windows clipped at the pair's capacity
#     are padded +inf at the peak for ASC cells / -inf at the tail for DESC
#     cells so the pad sorts into the spill rows), log2(CHUNK)-stage
#     bitonic merge in the cell's output direction, then an unordered
#     manual chunk DMA out (2-deep pipelined for buffer reuse). The final
#     buffer's tail is sentinel-restored for the downstream searchsorted.
# ---------------------------------------------------------------------------

# Hardware sweep 2026-08-19 with block_rows=256: chunk_rows 128: 66.9 ms
# e2e / sort 45.9; 256: 59.4 / 39.3; 512: 58.4 / 39.4 — 512 edges 256 at
# the headline (fewer cells + one fewer level-rounding row), within ~1 ms
# noise; merge scratch stays < 7 MB VMEM.
CHUNK_ROWS = int(_os.environ.get("GS_MERGE_CHUNK_ROWS", "512"))  # bench A/B knob
assert CHUNK_ROWS >= 8 and (CHUNK_ROWS & (CHUNK_ROWS - 1)) == 0, (
    f"GS_MERGE_CHUNK_ROWS must be a power of two >= 8, got {CHUNK_ROWS}"
)
CHUNK = CHUNK_ROWS * LANES  # entries per merge grid cell
_NR = CHUNK_ROWS + 8  # piece DMA rows: +1 for unaligned pieces, 8-aligned

# Split-search fan-out (candidates per serial probe round = SPLIT_ARY - 1).
# Hardware A/B 2026-08-21 (in-frame, merge levels total at E=24M): ary 4
# 21.9 ms, ary 8 26.8, ary 16 33.0, ary 32 46.1 — per-CANDIDATE cost
# dominates (each probed candidate behaves like an independent ~13 us
# gather, not a free rider on a latency-bound round), so wider fan-outs
# are a measured dead end, and with the interpolation pre-round +
# early-exit below (which shrink the serial round count a different way)
# plain BISECTION is the cheapest finisher: in-frame totals 37.8/38.4 ms
# for ary 2/4 with interp+sharing. The 2026-08-19 "4-ary halved the
# search" note predates interp; it no longer holds.
SPLIT_ARY = int(_os.environ.get("GS_SORT_SPLIT_ARY", "2"))
assert SPLIT_ARY >= 2, SPLIT_ARY

# Interpolation pre-round + early-exit rounds for the split search. Sort
# keys are close to uniformly drawn for both runs of a pair (same global
# tile/depth distribution), so the merge path passes near the proportional
# point a0 ~ r * |A| / (|A| + |B|) with hypergeometric spread
# sd <= sqrt(min(r, |A|)) / 2: one 3-candidate probe round around that
# estimate collapses the interval from run size to ~sd, and the remaining
# bisection runs under a lax.while_loop that stops as soon as EVERY cell's
# interval is closed (typical: ~5 rounds total instead of the static
# worst-case 15; the worst case stays available for adversarial keys, so
# correctness never depends on the distribution).
SPLIT_INTERP = _os.environ.get("GS_SORT_SPLIT_INTERP", "1") not in ("0", "false")
# meta columns
(_M_NOOP, _M_DIR, _M_AROW, _M_ADELTA, _M_BROW, _M_BDELTA, _M_LENA, _M_OROW,
 _M_LENW) = range(9)


def _ragged_level_meta(keys, starts_rows, stored, live, ncells: int,
                       n_iters: int = 25):
    """Merge-level metadata over ragged runs (all entry counts, not rows).

    keys: flat (Ealloc,) u32; starts_rows/stored/live: (nruns,) i32 run
    descriptors (stored/starts in entries/rows, multiples of 128/1 row).
    `n_iters` bounds the split binary search: ceil(log2(max run size)) + 1
    iterations suffice (the search interval is at most the smaller run).
    Returns meta (ncells, 8) i32 plus next-level run descriptors.
    """
    e_alloc = keys.shape[0]
    rows_alloc = e_alloc // LANES
    nruns = starts_rows.shape[0]
    if nruns % 2:
        starts_rows = jnp.concatenate([starts_rows, starts_rows[-1:] + stored[-1:] // LANES])
        stored = jnp.concatenate([stored, jnp.zeros(1, jnp.int32)])
        live = jnp.concatenate([live, jnp.zeros(1, jnp.int32)])

    a_base = starts_rows[0::2] * LANES
    b_base = starts_rows[1::2] * LANES
    sa = stored[0::2]
    sb = stored[1::2]
    la = live[0::2]
    lb = live[1::2]
    cap = sa + sb
    out_live = la + lb
    out_stored = ((out_live + LANES - 1) // LANES) * LANES
    # Every pair gets CHUNK_ROWS of private spill pad after its stored rows,
    # so no two cells ever write overlapping rows and output DMAs need no
    # cross-cell ordering (they still pipeline 2-deep for buffer reuse).
    npairs_l = sa.shape[0]
    out_start_rows = (
        jnp.concatenate(
            [jnp.zeros(1, jnp.int32),
             jnp.cumsum(out_stored // LANES)[:-1].astype(jnp.int32)]
        )
        + jnp.arange(npairs_l, dtype=jnp.int32) * CHUNK_ROWS
    )
    nch = jnp.maximum(1, -(-out_stored // CHUNK))
    cum = jnp.cumsum(nch).astype(jnp.int32)
    total_cells = cum[-1]

    c = jnp.arange(ncells, dtype=jnp.int32)
    p = jnp.searchsorted(cum, c, side="right").astype(jnp.int32)
    noop = c >= total_cells
    p = jnp.minimum(p, cum.shape[0] - 1)
    q = c - jnp.where(p > 0, cum[jnp.maximum(p - 1, 0)], 0)
    asc = (p % 2) == 0

    capp, sap, sbp = cap[p], sa[p], sb[p]
    window_base = jnp.where(asc, 0, capp - out_stored[p])
    r0 = window_base + q * CHUNK
    r0c = jnp.clip(r0, 0, capp)
    r1c = jnp.clip(r0 + CHUNK, 0, capp)
    a_bp, b_bp = a_base[p], b_base[p]

    def split(r, pidx):
        """#entries from run A among the first r ranks of pair `pidx[i]`
        (bottom ranks for asc cells, top ranks for desc), capacities
        included. Called once on the full boundary vector so every search
        shares one fori_loop."""
        asc2 = (pidx % 2) == 0
        sap2 = sa[pidx]
        sbp2 = sb[pidx]
        a_bp2 = a_base[pidx]
        b_bp2 = b_base[pidx]
        lo = jnp.maximum(0, r - sbp2)
        hi = jnp.minimum(r, sap2)

        def probe(lo, hi, mk):
            """Monotone narrowing on candidate matrix mk ((k, Q), any
            values): a probe at m is a global half-space constraint on the
            true split (take -> a0 >= m+1, reject -> a0 <= m), so any
            candidate inside [lo, hi) tightens the interval; rows outside
            it are masked out. The probe predicate is monotone
            non-increasing in m: for asc cells va = A[m] rises while vb
            walks B's tail upward (B is stored DESCENDING — pair runs
            alternate direction), so vb falls; the desc case mirrors
            both. Per-candidate cost dominates per-round cost on this
            platform (hw 2026-08-21: in-frame merge-levels total at ary
            4/8/16/32 = 21.9/26.8/33.0/46.1 ms), so rounds stay narrow and
            the win comes from FEWER EFFECTIVE ROUNDS (interpolation +
            early exit below)."""
            ok = (mk >= lo) & (mk < hi)
            mc = jnp.clip(mk, 0, jnp.maximum(hi - 1, 0))
            ia = jnp.where(asc2, a_bp2 + mc, a_bp2 + sap2 - 1 - mc)
            ib = jnp.where(asc2, b_bp2 + sbp2 - (r - mc), b_bp2 + (r - mc) - 1)
            va = keys[jnp.clip(ia, 0, e_alloc - 1)]  # ONE (k, Q) gather
            vb = keys[jnp.clip(ib, 0, e_alloc - 1)]
            take = jnp.where(asc2, va <= vb, va >= vb)
            for j in range(mk.shape[0]):
                lo = jnp.where(ok[j] & take[j], mc[j] + 1, lo)
                hi = jnp.where(ok[j] & ~take[j], jnp.minimum(hi, mc[j]), hi)
            return lo, hi

        if SPLIT_INTERP:
            # Proportional estimate + 3*sd bracket (see SPLIT_INTERP note).
            # f32 rounding of r*(sap/cap) is ~2 ulp at 24M — inside the
            # bracket. A missed bracket (adversarial keys) just leaves a
            # one-sided interval for the bisection rounds below.
            capf = jnp.maximum(sap2 + sbp2, 1).astype(jnp.float32)
            prop = (r.astype(jnp.float32)
                    * (sap2.astype(jnp.float32) / capf)).astype(jnp.int32)
            w0f = jnp.maximum(hi - lo, 0).astype(jnp.float32)
            d3 = (1.5 * jnp.sqrt(w0f)).astype(jnp.int32) + 8
            mk = jnp.stack([prop - d3, prop, prop + d3])
            lo, hi = probe(lo, hi, mk)

        # The interval [lo, hi] starts no wider than the smaller run
        # (< 2^n_iters); each k-ary round divides the width by ~k (+1 for
        # rounding), so ceil(n_iters / log2(k)) + 2 rounds close every
        # cell even if the interpolation bracket missed. The while_loop
        # exits as soon as all intervals are closed (typical frames: ~4-5
        # rounds — the bracket leaves ~2*sd entries).
        kbits = max(1, SPLIT_ARY.bit_length() - 1)
        rounds = -(-n_iters // kbits) + 2

        def cond(state):
            i, lo, hi = state
            return (i < rounds) & jnp.any(lo < hi)

        def body(state):
            i, lo, hi = state
            w = hi - lo
            mk = jnp.stack([lo + (w * j) // SPLIT_ARY
                            for j in range(1, SPLIT_ARY)])  # (k-1, Q)
            lo, hi = probe(lo, hi, mk)
            return i + 1, lo, hi

        _, lo, hi = jax.lax.while_loop(cond, body, (jnp.int32(0), lo, hi))
        return lo

    # Boundary sharing (hw 2026-08-21): consecutive chunks of a pair abut —
    # cell c's upper rank boundary IS cell c+1's lower one — so only each
    # cell's r0 plus one final r1 per PAIR needs a search: Q drops from
    # 2*ncells to ncells + npairs (~-45% of the probe gathers, which price
    # per candidate, not per round — see SPLIT_ARY note).
    pair_ids = jnp.arange(npairs_l, dtype=jnp.int32)
    wb_pair = jnp.where((pair_ids % 2) == 0, 0, cap - out_stored)
    r1_pair = jnp.clip(wb_pair + nch * CHUNK, 0, cap)
    res = split(jnp.concatenate([r0c, r1_pair]),
                jnp.concatenate([p, pair_ids]))
    a0 = res[:ncells]
    # Non-final chunks take the next cell's a0 (same pair, same boundary);
    # each pair's final chunk takes the pair-level r1 search result.
    is_last = q == (nch[p] - 1)
    a1 = jnp.where(is_last, res[ncells:][p], jnp.roll(a0, -1))
    lena = a1 - a0
    b0 = r0c - a0
    b1 = r1c - a1

    a_start = jnp.where(asc, a_bp + a0, a_bp + sap - a1)
    b_start = jnp.where(asc, b_bp + sbp - b1, b_bp + b0)

    def rowdelta(start):
        row0 = jnp.clip(start // LANES, 0, rows_alloc - _NR)
        return row0, start - row0 * LANES

    a_row0, a_delta = rowdelta(a_start)
    b_row0, b_delta = rowdelta(b_start)
    out_row0 = out_start_rows[p] + q * CHUNK_ROWS

    # (9, ncells): SMEM pads the minor dimension to 128 lanes, so the cell
    # axis must be minor (a (ncells, 9) layout costs 512 B per cell).
    meta = jnp.stack(
        [noop.astype(jnp.int32), asc.astype(jnp.int32),
         a_row0, a_delta, b_row0, b_delta, lena, out_row0,
         r1c - r0c],
        axis=0,
    )
    return meta, out_start_rows, out_stored, out_live


def _cyclic_shift_left(x, delta):
    """Entry-order cyclic left shift of a row-major (R, 128) tile by a traced
    `delta`: out[e] = x[(e + delta) mod R*128]."""
    rows = x.shape[0]
    rs = delta // LANES
    dl = delta % LANES
    z = pltpu.roll(x, shift=(rows - rs) % rows, axis=0)
    z1 = pltpu.roll(z, shift=rows - 1, axis=0)  # rows shifted by one more
    t1 = pltpu.roll(z, shift=(LANES - dl) % LANES, axis=1)
    t2 = pltpu.roll(z1, shift=(LANES - dl) % LANES, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    return jnp.where(lane < LANES - dl, t1, t2)


def _merge_kernel(meta_ref, ka_ref, p1a_ref, p2a_ref, p3a_ref,
                  *out_and_scratch, interleaved: bool = False):
    if interleaved:
        # Final-level mode: flat keys (for the boundary searchsorted) plus
        # the compositor's (R, 4, 128) row-interleaved entry planes.
        ko_ref, inter_ref, pieces, outbuf, sems, out_sems = out_and_scratch
    else:
        (ko_ref, p1o_ref, p2o_ref, p3o_ref,
         pieces, outbuf, sems, out_sems) = out_and_scratch
    c = pl.program_id(0)
    n = pl.num_programs(0)
    in_refs = (ka_ref, p1a_ref, p2a_ref, p3a_ref)
    if not interleaved:
        out_refs = (ko_ref, p1o_ref, p2o_ref, p3o_ref)

    def in_dma(cc, slot, piece, op):
        row0 = meta_ref[_M_AROW + 2 * piece, cc]
        return pltpu.make_async_copy(
            in_refs[op].at[pl.ds(row0, _NR), :],
            pieces.at[slot, piece, op],
            sems.at[slot, piece, op],
        )

    def issue(cc, slot):
        @pl.when(meta_ref[_M_NOOP, cc] == 0)
        def _():
            for piece in range(2):
                for op in range(4):
                    in_dma(cc, slot, piece, op).start()

    @pl.when(c == 0)
    def _():
        issue(0, 0)

    @pl.when(c + 1 < n)
    def _():
        issue(c + 1, (c + 1) % 2)

    noop = meta_ref[_M_NOOP, c]
    oslot = c % 2

    # Output groups pipeline 2-deep: before cell c rewrites outbuf[c%2],
    # wait for cell c-2's DMA out of that slot. Output rows are disjoint
    # across cells (private per-pair spill pads), so no other ordering is
    # needed. NB: condition operands evaluate unconditionally — clamp SMEM
    # indices (meta_ref[., -1] is out of bounds).
    def out_dmas(cc, slot):
        orow = pl.ds(meta_ref[_M_OROW, cc], CHUNK_ROWS)
        if interleaved:
            return [
                pltpu.make_async_copy(outbuf.at[slot, 0], ko_ref.at[orow, :],
                                      out_sems.at[slot])
            ] + [
                pltpu.make_async_copy(outbuf.at[slot, op],
                                      inter_ref.at[orow, op, :],
                                      out_sems.at[slot])
                for op in range(4)
            ]
        return [
            pltpu.make_async_copy(outbuf.at[slot, op],
                                  out_refs[op].at[orow, :], out_sems.at[slot])
            for op in range(4)
        ]

    def wait_group(cc):
        for dma in out_dmas(cc, cc % 2):
            dma.wait()

    cm2 = jnp.maximum(c - 2, 0)

    @pl.when((c >= 2) & (meta_ref[_M_NOOP, cm2] == 0))
    def _():
        wait_group(cm2)

    @pl.when(noop == 0)
    def _():
        slot = c % 2
        for piece in range(2):
            for op in range(4):
                in_dma(c, slot, piece, op).wait()

        a_delta = meta_ref[_M_ADELTA, c]
        b_delta = meta_ref[_M_BDELTA, c]
        lena = meta_ref[_M_LENA, c]
        asc = meta_ref[_M_DIR, c] == 1
        e_iota = (
            jax.lax.broadcasted_iota(jnp.int32, (CHUNK_ROWS, LANES), 0) * LANES
            + jax.lax.broadcasted_iota(jnp.int32, (CHUNK_ROWS, LANES), 1)
        )
        lane_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_ROWS, LANES), 1)
        row_iota = jax.lax.broadcasted_iota(jnp.int32, (CHUNK_ROWS, LANES), 0)

        lenw = meta_ref[_M_LENW, c]
        lenb = lenw - lena
        # Pass-through fast path: the whole rank window comes from a
        # row-aligned A piece (lenb == 0, a_delta == 0). A's direction
        # always matches the output direction (pair runs alternate), so the
        # piece is already sorted — skip the 16-stage network and copy.
        # With pre-sort compaction the final level routinely merges the
        # fully-merged run 0 against an empty run (live runs < static
        # runs), making this the whole final level; interior boundary
        # cells hit it too. Garbage slots beyond lenw land at ranks >= the
        # pair capacity, i.e. in spill rows past `stored` — never read.
        fast = (lenb == 0) & (a_delta == 0)

        @pl.when(fast)
        def _():
            for op in range(4):
                outbuf[oslot, op] = pieces[slot, 0, op][:CHUNK_ROWS]

        @pl.when(jnp.logical_not(fast))
        def _():
            # Chunks whose rank window is clipped at the pair's capacity
            # have chunk - lenw garbage slots; they must be padded with
            # values that keep S bitonic AND sort into the spill rows: ASC
            # cells pad +inf at the PEAK (between the ascending A piece and
            # descending B piece — +inf after B would add a third monotone
            # segment); DESC cells pad -inf after B (the valley). Both pads
            # land in the spill rows of the output (the real window is a
            # whole number of rows).
            b_off = jnp.where(asc, CHUNK - lenb, lena)
            in_b = (e_iota >= b_off) & (e_iota < b_off + lenb)
            pad_key = jnp.where(asc, jnp.int32(0x7FFFFFFF),
                                jnp.int32(-0x80000000))
            ops = []
            for op in range(4):
                pa = _cyclic_shift_left(pieces[slot, 0, op], a_delta)[:CHUNK_ROWS]
                # Realign (left by b_delta) and rotate-into-position (right
                # by b_off) compose into ONE cyclic shift of the raw piece:
                # live entries e in [b_off, b_off+lenb) need piece[e - b_off
                # + b_delta], which is in [0, _NR*LANES) — everything
                # outside the window is masked below, so the differing
                # moduli don't matter.
                pb = _cyclic_shift_left(
                    pieces[slot, 1, op], (b_delta - b_off) % (_NR * LANES)
                )[:CHUNK_ROWS]
                if op == 0:
                    s = jnp.where(e_iota < lena, _to_ord(pa),
                                  jnp.where(in_b, _to_ord(pb), pad_key))
                else:
                    s = jnp.where(e_iota < lena, pa, pb)
                ops.append(s)

            # Bitonic merge of [asc piece | desc piece] in the output
            # direction. Strides >= LANES ride cheap sublane rolls in
            # row-major order; for the 7 small strides, transpose each
            # 128x128 tile so they ride sublane rolls too (cross-lane rolls
            # measure ~4x slower — the same trade that cut phase 1
            # 30.8 -> 17.5 ms), then transpose back for the row-major
            # output DMA. A stride-j<128 partner stays inside its 128-entry
            # group, so per-tile transposes never split a pair.
            def stage(ops, j, lane_major):
                k = ops[0]
                pk, is_lower = _partner(k, j, lane_iota, row_iota, lane_major)
                want_min = is_lower == asc
                knew = jnp.where(want_min, jnp.minimum(k, pk),
                                 jnp.maximum(k, pk))
                swap = knew != k
                nxt = [knew]
                for pvals in ops[1:]:
                    pp, _ = _partner(pvals, j, lane_iota, row_iota, lane_major)
                    nxt.append(jnp.where(swap, pp, pvals))
                return nxt

            j = CHUNK // 2
            while j >= LANES:
                ops = stage(ops, j, False)
                j //= 2
            ops = [_transpose_tiles(o, LANES) for o in ops]
            while j >= 1:
                ops = stage(ops, j, True)
                j //= 2
            ops = [_transpose_tiles(o, LANES) for o in ops]

            outbuf[oslot, 0] = _from_ord(ops[0])
            for op in range(1, 4):
                outbuf[oslot, op] = ops[op]

    @pl.when(noop == 0)
    def _():
        for dma in out_dmas(c, oslot):
            dma.start()

    # Drain at the grid end: groups n-1 and n-2 have no c+2 successor.
    cm1 = jnp.maximum(c - 1, 0)

    @pl.when((c == n - 1) & (noop == 0))
    def _():
        wait_group(c)

    @pl.when((c == n - 1) & (c >= 1) & (meta_ref[_M_NOOP, cm1] == 0))
    def _():
        wait_group(cm1)


def _merge_level(planes, meta, out_rows: int, interpret: bool = False,
                 interleaved: bool = False):
    """Run one ragged merge level; planes are 4 (rows, LANES) u32 arrays
    (input and output row counts differ — outputs carry per-pair spill
    pads). With `interleaved` (the final level), returns (flat_keys,
    (rows, 4, 128) interleaved planes) instead of 4 flat planes."""
    rows_alloc = out_rows
    ncells = meta.shape[1]

    if interleaved:
        out_shape = [
            jax.ShapeDtypeStruct((rows_alloc, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((rows_alloc, 4, LANES), jnp.uint32),
        ]
        n_out = 2
    else:
        out_shape = [jax.ShapeDtypeStruct((rows_alloc, LANES), jnp.uint32)] * 4
        n_out = 4
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncells,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * n_out,
        scratch_shapes=[
            pltpu.VMEM((2, 2, 4, _NR, LANES), jnp.uint32),
            pltpu.VMEM((2, 4, CHUNK_ROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((2, 2, 4)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_merge_kernel, interleaved=interleaved),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(meta, *planes)


def block_live_counts(ks, run_rows: int = None) -> jnp.ndarray:
    """(nruns,) live-entry counts of run-sorted flat keys (sentinels have
    sorted to each run's extremity; an XLA reduction). `run_rows` defaults
    to the phase-1 block granularity."""
    run = (run_rows or BLOCK_ROWS) * LANES
    e = ks.size
    nruns = e // run
    live = (ks.reshape(-1) != jnp.uint32(SENTINEL)).astype(jnp.int32)
    return jnp.sum(live.reshape(nruns, run // 256, 256), axis=(1, 2))


def merge_presorted(ks, s1, s2, s3, interpret: bool = False,
                    interleaved: bool = False):
    """Phase 2 only: merge flat planes that are ALREADY block-sorted in
    BLOCK-entry runs alternating asc/desc by parity (e.g. by the fused
    enumerate+sort front-end kernel). Same output contract as merge_sort."""
    e = ks.shape[0]
    assert e % BLOCK == 0, e
    counts = block_live_counts(ks, BLOCK_ROWS)
    return _merge_phase(
        [a.reshape(e // LANES, LANES) for a in (ks, s1, s2, s3)],
        counts, BLOCK_ROWS, interpret=interpret, interleaved=interleaved,
    )


@functools.partial(jax.jit, static_argnames=("interpret", "interleaved",
                                              "max_levels", "fuse_l1",
                                              "compact"))
def merge_sort(keys, p1, p2, p3, interpret: bool = False,
               interleaved: bool = False, max_levels: int | None = None,
               fuse_l1: bool | None = None, compact: bool = False):
    """Full sort of (keys + 3 payload planes), ascending by key — the
    drop-in replacement for `lax.sort((k, p1, p2, p3), num_keys=1)` on the
    entry planes, returning arrays LONGER than the input (the merge levels
    append per-pair spill pads; the tail beyond the live prefix is all
    sentinel keys). Sentinel-slot payloads are unspecified (never read).

    With `interleaved`, the FINAL merge level writes the compositor's
    (R, 4, 128) row-interleaved layout directly (plane 0 duplicated as the
    flat key array for the boundary searchsorted) and the return is
    (flat_keys, interleaved) — saving a 384 MB XLA interleave pass. Falls
    back to the tuple form (caller stacks) for geometries the Pallas path
    rejects."""
    e = keys.shape[0]
    rows_total = e // LANES
    # Piece DMA needs _NR input rows; tiny arrays delegate to lax.sort.
    if BLOCK < e and rows_total < _NR:
        return jax.lax.sort((keys, p1, p2, p3), num_keys=1, is_stable=False)
    live_rows = None
    if compact and rows_total % _COMPACT_CROWS == 0 and e > BLOCK:
        from .compact import compact_entries

        keys, p1, p2, p3, live_rows = compact_entries(
            keys, p1, p2, p3, interpret=interpret)
        e = keys.shape[0]
    ks, s1, s2, s3, counts = block_sort(keys, p1, p2, p3, interpret=interpret,
                                        fuse_l1=fuse_l1, live_rows=live_rows)
    run_rows = _plan_block_sort(e, fuse_l1)[2]
    return _merge_phase([ks, s1, s2, s3], counts, run_rows,
                        interpret=interpret, interleaved=interleaved,
                        max_levels=max_levels)


def _merge_phase(planes, counts, run_rows: int, interpret: bool = False,
                 interleaved: bool = False, max_levels: int | None = None):
    """Merge-path levels over run-sorted (rows, LANES) planes (runs of
    `run_rows` rows, alternating asc/desc by parity).

    `max_levels` truncates the level loop (benchmark instrumentation:
    per-level device time = t(k) - t(k-1)); the truncated result is NOT a
    full sort — only scripts/bench_sort.py uses it."""
    rows_total = planes[0].shape[0]
    e = rows_total * LANES
    run = run_rows * LANES
    nruns = e // run
    if nruns == 1:
        return tuple(a.reshape(-1) for a in planes)

    starts_rows = jnp.arange(nruns, dtype=jnp.int32) * run_rows
    # Level-1 descriptor tightening (VERDICT r4: "kill the sentinel slack"):
    # phase-1 runs carry their sorted-out sentinel slack (~44% of E at the
    # bench scene) as a contiguous extremity — the TAIL of asc (even) runs,
    # the HEAD of desc (odd) runs. Trimming whole sentinel rows from the
    # descriptors here makes level 1 live-sized like every later level
    # (hw 2026-08-20: level 1 was 4.6 ms on 25.2M stored vs ~2.6 live-only)
    # and establishes the same <=127-entry-slack invariant the level
    # outputs already satisfy, so nothing downstream changes.
    slack_rows = (jnp.int32(run) - counts) // LANES
    parity = jnp.arange(nruns, dtype=jnp.int32) % 2
    starts_rows = starts_rows + jnp.where(parity == 1, slack_rows, 0)
    stored = jnp.int32(run) - slack_rows * LANES
    live = counts
    inter = None
    # Static per-level cap on run size (doubles each level; the +1 row of
    # rounding slack per merge is absorbed by the ceil) — bounds the split
    # search depth.
    run_cap = run
    level = 0
    while nruns > 1:
        if max_levels is not None and level >= max_levels:
            break
        level += 1
        npairs = -(-nruns // 2)
        # Static worst-case cells: all rows live (+ <=1 slack row per pair)
        # plus one minimum chunk per pair.
        ncells = -(-(rows_total + npairs) // CHUNK_ROWS) + npairs
        # Output rows: stored (<= rows_total + 1 slack row per pair) plus
        # each pair's private CHUNK_ROWS spill pad.
        out_rows = rows_total + npairs * (CHUNK_ROWS + 1)
        n_iters = max(run_cap, 2).bit_length() + 1
        meta, starts_rows, stored, live = _ragged_level_meta(
            planes[0].reshape(-1), starts_rows, stored, live, ncells,
            n_iters=n_iters,
        )
        run_cap = 2 * run_cap + 2 * LANES
        last = interleaved and npairs == 1
        out = _merge_level(planes, meta, out_rows, interpret=interpret,
                           interleaved=last)
        if last:
            planes = [out[0]]
            inter = out[1]
        else:
            planes = out
        nruns = npairs

    # The tail beyond the final run's stored rows holds unwritten/spill
    # garbage — restore the sentinel invariant for the downstream
    # searchsorted.
    final_rows = planes[0].shape[0]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (final_rows, LANES), 0)
    keys_out = jnp.where(row_ids < starts_rows[0] + stored[0] // LANES,
                         planes[0], jnp.uint32(SENTINEL))
    if inter is not None:
        return keys_out.reshape(-1), inter
    return (keys_out.reshape(-1), planes[1].reshape(-1),
            planes[2].reshape(-1), planes[3].reshape(-1))


def _pad_to_block(keys, p1, p2, p3):
    """Pad entry planes to a BLOCK multiple with sentinel-key slots so the
    Pallas merge sort stays eligible for every large size (advisor r3:
    doubling BLOCK_ROWS silently dropped 16384-but-not-32768-multiple
    entry counts onto the ~3x slower lax.sort path). A sentinel tail is
    already the sort's output contract — callers read the live prefix.

    With pre-sort compaction enabled the pad target is the compaction
    cell size instead (a BLOCK multiple; the bench's E = 24M is not
    naturally CROWS-row aligned and would otherwise silently skip
    compaction). The pad slots are sentinels, so compaction deletes them
    again before phase 1 ever sees them."""
    grain = _COMPACT_CROWS * LANES if COMPACT else BLOCK
    assert grain % BLOCK == 0, (grain, BLOCK)
    pad = (-keys.shape[0]) % grain
    if pad == 0:
        return keys, p1, p2, p3
    ktail = jnp.full((pad,), SENTINEL, jnp.uint32)
    ztail = jnp.zeros((pad,), jnp.uint32)
    return (jnp.concatenate([keys, ktail]), jnp.concatenate([p1, ztail]),
            jnp.concatenate([p2, ztail]), jnp.concatenate([p3, ztail]))


def sort_entries_interleaved(keys, p1, p2, p3, impl: str = "auto"):
    """Sort + direct interleave: returns (flat_keys, (R, 4, 128) planes) on
    the Pallas path, or (flat_keys, None, p1, p2, p3) sorted-tuple form when
    delegating (caller interleaves)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        if keys.shape[0] < 1_000_000:
            impl = "xla"
    if impl in ("pallas", "interpret"):
        keys, p1, p2, p3 = _pad_to_block(keys, p1, p2, p3)
        out = merge_sort(keys, p1, p2, p3, interpret=impl == "interpret",
                         interleaved=True, compact=COMPACT)
        if len(out) == 2:
            return out[0], out[1], None, None, None
        sk, s1, s2, s3 = out
    else:
        sk, s1, s2, s3 = jax.lax.sort((keys, p1, p2, p3), num_keys=1,
                                      is_stable=False)
    return sk, None, s1, s2, s3


def sort_entries(keys, p1, p2, p3, impl: str = "auto"):
    """Entry-plane sort dispatcher: the Pallas merge sort on TPU, lax.sort
    elsewhere (CPU tests / odd geometries fall through inside merge_sort).
    NOTE: the Pallas path may return arrays LONGER than the input, with a
    sentinel-key tail."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
        # Small arrays: lax.sort's fixed cost wins under the merge
        # pipeline's per-level overheads (~1 ms at E=205k vs ~3.5 ms).
        if keys.shape[0] < 1_000_000:
            impl = "xla"
    if impl in ("pallas", "interpret"):
        keys, p1, p2, p3 = _pad_to_block(keys, p1, p2, p3)
        return merge_sort(keys, p1, p2, p3, interpret=impl == "interpret",
                          compact=COMPACT)
    return jax.lax.sort((keys, p1, p2, p3), num_keys=1, is_stable=False)
