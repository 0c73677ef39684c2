"""Pre-sort sentinel compaction of packed entry planes (Pallas, TPU).

At the 6M@1080p bench scene ~44% of the E = N*max_dup enumerated entry
slots are sentinels (culled splats + dup slots past each splat's tile
count), and phase 1 of the merge sort (`ops/sort.py`) pays full bitonic
stage work for them — 18.3 ms of which ~8 ms is sentinel slack (hw
2026-08-20). This kernel packs the live entries into a dense prefix
BEFORE phase 1, so the block sort runs ~44% fewer live blocks (dead
blocks no-op via a live-row scalar) and level 1 of the merge starts
live-sized. Reference behavior anchor: the radix sorter in the reference
engine sorts exactly `n_visible` entries per frame
(`src/tab/scene.rs:865-869`); this is the TPU equivalent of not sorting
the culled tail.

Design (no gathers, no scatters — TPU has neither):

  * The sort consumes entries in ANY order, so compaction only needs to
    be contiguous, not order-preserving per lane. Entries move ALONG
    SUBLANES (the cheap roll axis) within each 128-lane column of a
    CROWS-row grid cell.
  * Per column, each live entry's deficit = number of dead slots above
    it; moving every live entry up by its deficit packs the column. The
    move runs as a butterfly: log2(CROWS) rounds of whole-tile sublane
    rolls + selects, round j moving entries whose deficit has bit j set
    up by 2^j rows. Destinations (row - deficit) are strictly increasing
    per column, and clearing deficit bits low-to-high keeps them
    conflict-free (classic packing-network argument; exhaustively
    checked against a numpy oracle in tests/test_compact.py).
  * Each cell's packed height is its column maximum (data-dependent,
    8-row aligned). Cells write EXACTLY their packed rows to a cumsum
    row offset as a BINARY DECOMPOSITION of the dynamic height: one
    conditional fixed-size DMA per set bit (<= 8 per plane). Output
    regions are disjoint, so the DMAs pipeline freely across cells with
    only the standard depth-2 scratch-reuse wait — no cross-cell
    ordering chain. (A first cut wrote full CROWS-row blocks at packed
    offsets, deliberately overlapping the next cell and serializing on a
    completion chain; the chain's per-cell latency was comparable to the
    butterfly compute and this variant replaced it.)
  * Offsets come from a cheap XLA prepass (column sums -> per-cell max
    -> cumsum), prefetched as scalars.

The output planes keep the input's static allocation plus one CROWS pad
block; only `live_rows * LANES` leading entries are meaningful, rows
beyond are unwritten garbage — `block_sort(live_rows=...)` masks them to
sentinels on load and skips dead blocks entirely.
"""

from __future__ import annotations

import functools
import os as _os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SENTINEL = 0xFFFFFFFF

# Rows per compaction grid cell. Bigger cells concentrate the per-cell
# column-max slack (relative sd of a 256-splat column sum shrinks as
# 1/sqrt(rows)): ~12% residual slack at 1024 rows vs ~23% at 512 on the
# bench scene's ~56% live fraction. VMEM: 4 in planes (double-buffered) +
# 2x4 out scratch = 8 MB at 1024 rows. Env override is a bench A/B knob;
# the CPU test suite also sets it small (conftest) — the butterfly and
# packing logic are CROWS-generic and interpret mode scales quadratically.
CROWS = int(_os.environ.get("GS_COMPACT_CROWS", "1024"))
assert CROWS >= 8 and (CROWS & (CROWS - 1)) == 0, (
    f"GS_COMPACT_CROWS must be a power of two >= 8, got {CROWS}"
)


def plan_compact(keys: jnp.ndarray):
    """XLA prepass: per-cell packed row offsets from column live counts.

    keys: flat (E,) u32 with E a CROWS*LANES multiple. Returns
    (off8, live_rows): off8 (ncells + 1,) i32 8-row-aligned output row
    offsets (off8[c+1] - off8[c] = cell c's packed height), live_rows
    scalar i32 = off8[-1], the total live-prefix height; everything
    at/after it in the output is dead.
    """
    rows = keys.shape[0] // LANES
    ncells = rows // CROWS
    v = (keys.reshape(ncells, CROWS, LANES) != jnp.uint32(SENTINEL))
    ncol = jnp.sum(v, axis=1, dtype=jnp.int32)  # (ncells, LANES)
    rmax = jnp.max(ncol, axis=1)                # (ncells,)
    r8 = ((rmax + 7) // 8) * 8
    off8 = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(r8).astype(jnp.int32)]
    )
    return off8, off8[-1]


def _compact_kernel(off_ref, k_ref, p1_ref, p2_ref, p3_ref,
                    ko_ref, p1o_ref, p2o_ref, p3o_ref,
                    scratch, sems, *, rows: int):
    c = pl.program_id(0)
    n = pl.num_programs(0)
    sent = jnp.uint32(SENTINEL)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)

    k = k_ref[...]
    inv = (k == sent).astype(jnp.int32)

    # Exclusive per-column prefix sum of dead slots (Hillis-Steele along
    # sublanes): d[r, l] = #dead in rows [0, r) of column l.
    d = inv
    s = 1
    while s < rows:
        sh = pltpu.roll(d, shift=s, axis=0)
        d = d + jnp.where(row_iota >= s, sh, 0)
        s *= 2
    d = d - inv

    # Butterfly pack: round j moves entries with deficit bit j up 2^j.
    ops = [k, p1_ref[...], p2_ref[...], p3_ref[...]]
    s = 1
    while s < rows:
        rolled = [pltpu.roll(o, shift=rows - s, axis=0) for o in ops]
        dy = pltpu.roll(d, shift=rows - s, axis=0)
        below_live = (rolled[0] != sent) & (row_iota < rows - s)
        take = below_live & ((dy & s) != 0)
        stay = (ops[0] != sent) & ((d & s) == 0)
        nxt = [jnp.where(take, rolled[0], jnp.where(stay, ops[0], sent))]
        for o, ro in zip(ops[1:], rolled[1:]):
            nxt.append(jnp.where(take, ro, o))
        d = jnp.where(take, dy - s, d)
        ops = nxt
        s *= 2

    slot = c % 2
    out_refs = (ko_ref, p1o_ref, p2o_ref, p3o_ref)
    sizes = [sz for sz in (1 << b for b in range(rows.bit_length(), 2, -1))
             if sz <= rows]

    def out_dmas(cc, sl):
        """Exact-height output: one fixed-size DMA per set bit of the
        cell's packed height (8-row aligned, <= `rows`), regions disjoint
        across cells so the copies pipeline with no cross-cell ordering."""
        orow = off_ref[cc]
        nrows = off_ref[cc + 1] - orow
        dmas = []
        base = jnp.int32(0)
        for bi, sz in enumerate(sizes):
            take = (nrows & sz) != 0
            for i in range(4):
                dmas.append((take, pltpu.make_async_copy(
                    scratch.at[sl, i, pl.ds(base, sz), :],
                    out_refs[i].at[pl.ds(orow + base, sz), :],
                    sems.at[sl, i, bi],
                )))
            base = base + (nrows & sz)
        return dmas

    def start_group(cc, sl):
        for take, dma in out_dmas(cc, sl):
            @pl.when(take)
            def _(dma=dma):
                dma.start()

    def wait_group(cc, sl):
        for take, dma in out_dmas(cc, sl):
            @pl.when(take)
            def _(dma=dma):
                dma.wait()

    # Depth-2 pipeline: slot c%2 was last used by cell c-2 — its copies
    # must have landed BEFORE this cell overwrites that scratch slot.
    cm2 = jnp.maximum(c - 2, 0)

    @pl.when(c >= 2)
    def _():
        wait_group(cm2, cm2 % 2)

    for i, o in enumerate(ops):
        scratch[slot, i] = o

    start_group(c, slot)

    @pl.when(c == n - 1)
    def _():
        wait_group(c, slot)

    cm1 = jnp.maximum(c - 1, 0)

    @pl.when((c == n - 1) & (c >= 1))
    def _():
        wait_group(cm1, cm1 % 2)


@functools.partial(jax.jit, static_argnames=("interpret",))
def compact_entries(keys, p1, p2, p3, interpret: bool = False):
    """Pack live entries (key != SENTINEL) into a dense prefix, any order.

    Flat (E,) u32 planes, E a CROWS*LANES multiple (the caller gates).
    Returns (keys_c, p1_c, p2_c, p3_c, live_rows): same-shape planes plus
    one CROWS-row pad block; entries in rows [0, live_rows) are exactly
    the live input entries plus < 1% interspersed sentinel slack (per-cell
    column-max rounding); rows beyond live_rows are UNSPECIFIED — callers
    must mask by live_rows (see block_sort).
    """
    e = keys.shape[0]
    rows = e // LANES
    assert rows % CROWS == 0, rows
    ncells = rows // CROWS
    off8, live_rows = plan_compact(keys)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ncells,),
        in_specs=[pl.BlockSpec((CROWS, LANES), lambda i, off: (i, 0),
                               memory_space=pltpu.VMEM)] * 4,
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
        scratch_shapes=[
            pltpu.VMEM((2, 4, CROWS, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA(
                (2, 4, max(1, CROWS.bit_length() - 3))),
        ],
    )
    outs = pl.pallas_call(
        functools.partial(_compact_kernel, rows=CROWS),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((rows + CROWS, LANES), jnp.uint32)] * 4,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(off8, *[a.reshape(rows, LANES) for a in (keys, p1, p2, p3)])
    return (*(o.reshape(-1) for o in outs), live_rows)
