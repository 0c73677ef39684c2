"""Pallas merge sort (ops/sort.py) vs lax.sort — interpret mode on CPU.

The sort is the TPU replacement for the crate's GPU radix sorter
(reference `src/tab/scene.rs:865-869`); contract: ascending keys, payloads
travel with their key, sentinel-slot payloads unspecified (never read).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from wgpu_3dgs_viewer_app_tpu.ops.sort import BLOCK, block_sort, merge_sort

SENT = 0xFFFFFFFF


def _mk(e, frac_sentinel, span, seed=0):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, span, e, dtype=np.uint32)
    k[rng.random(e) < frac_sentinel] = SENT
    p1 = np.arange(e, dtype=np.uint32)  # unique id payload
    p2 = rng.integers(0, 2**32, e, dtype=np.uint32)
    p3 = rng.integers(0, 2**32, e, dtype=np.uint32)
    return k, p1, p2, p3


def _check(k, p1, p2, p3, ks, s1, s2, s3):
    """Contract: live prefix sorted ascending with payloads attached; the
    tail (including any pad beyond len(k) — the Pallas path returns padded
    arrays) is all sentinel keys with unspecified payloads."""
    ks, s1, s2, s3 = (np.asarray(a).ravel() for a in (ks, s1, s2, s3))
    assert ks.shape[0] >= k.shape[0]
    nlive = int((k != SENT).sum())
    live = k != SENT
    assert np.array_equal(np.sort(k[live]), ks[:nlive]), "live keys not sorted"
    assert np.all(ks[nlive:] == SENT), "tail not sentinel"
    want = sorted(zip(k[live].tolist(), p1[live].tolist()))
    got = sorted(zip(ks[:nlive].tolist(), s1[:nlive].tolist()))
    assert want == got, "key/payload pairing broken"
    perm = s1[:nlive]
    assert np.array_equal(p2[perm], s2[:nlive])
    assert np.array_equal(p3[perm], s3[:nlive])


@pytest.mark.parametrize("frac", [0.0, 0.44])
def test_block_sort_interpret(frac):
    """Phase-1 contract: runs of `_plan_block_sort(e)` granularity
    (cell-sized when the in-cell merge fusion applies), alternating
    asc/desc by run parity, payloads travelling with their key."""
    from wgpu_3dgs_viewer_app_tpu.ops.sort import LANES, _plan_block_sort

    e = 4 * BLOCK
    k, p1, p2, p3 = _mk(e, frac, 1 << 20)
    ks, s1, s2, s3 = block_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                                interpret=True)[:4]
    ks, s1 = np.asarray(ks).ravel(), np.asarray(s1).ravel()
    run = _plan_block_sort(e)[2] * LANES
    assert ks.shape[0] % run == 0
    for r in range(e // run):
        sign = 1 if r % 2 == 0 else -1  # runs alternate asc / desc
        sl = slice(r * run, (r + 1) * run)
        want = np.sort(k[sl])[::sign]
        assert np.array_equal(want, ks[sl]), f"run {r} order wrong"
        pairs_w = sorted(zip(k[sl].tolist(), p1[sl].tolist()))
        pairs_g = sorted(zip(ks[sl].tolist(), s1[sl].tolist()))
        assert pairs_w == pairs_g


def test_block_sort_multi_subtile_blocks():
    """Generalized mixed-layout dir mask: 256-row (32K-entry) tiles — the
    one-fewer-merge-level block size — must sort asc/desc alternating
    through the same kernel body (subtile-index direction bits ride row
    bits 7+)."""
    import functools

    import jax
    from jax.experimental import pallas as pl

    from wgpu_3dgs_viewer_app_tpu.ops.sort import LANES, _block_sort_kernel

    rows, block_rows = 512, 256
    n = block_rows * LANES
    k, p1, p2, p3 = _mk(rows * LANES, 0.3, 1 << 24, seed=7)
    planes = [jnp.asarray(a).reshape(rows, LANES) for a in (k, p1, p2, p3)]
    outs = pl.pallas_call(
        functools.partial(_block_sort_kernel, rows=rows, block_rows=block_rows),
        out_shape=[jax.ShapeDtypeStruct((rows, LANES), jnp.uint32)] * 4,
        interpret=True,
    )(*planes)
    ks = np.asarray(outs[0]).ravel()
    s1 = np.asarray(outs[1]).ravel()
    for b, sign in ((0, 1), (1, -1)):
        sl = slice(b * n, (b + 1) * n)
        assert np.array_equal(np.sort(k[sl])[::sign], ks[sl]), f"block {b}"
        assert sorted(zip(k[sl].tolist(), p1[sl].tolist())) == sorted(
            zip(ks[sl].tolist(), s1[sl].tolist()))


@pytest.mark.parametrize("e,frac,span,fuse", [
    (BLOCK, 0.3, 1 << 32, None),       # single block
    (3 * BLOCK, 0.4, 1 << 24, None),   # odd block count (sentinel pad block)
    (4 * BLOCK, 0.44, 1 << 16, False), # fuse OFF: 4 runs -> 2 merge levels
    (8 * BLOCK, 0.44, 1 << 20, None),  # fused cells + 1 merge level
    # Split merge levels (multi-chunk pairs) at full depth — expensive in
    # interpret mode (~7 min on a slow box); opt in with GS_SLOW_TESTS=1.
    pytest.param(16 * BLOCK, 0.5, 1 << 32, None, marks=pytest.mark.slow),
])
def test_merge_sort_interpret(e, frac, span, fuse):
    k, p1, p2, p3 = _mk(e, frac, span)
    outs = merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                      interpret=True, fuse_l1=fuse)
    _check(k, p1, p2, p3, *outs)


def test_split_interp_interpret(monkeypatch):
    """TPU-default split search (binary + interpolation pre-round +
    early-exit while_loop, 2026-08-21) on CPU: the conftest pins the cheap
    bisection search for suite speed, so this test re-enables the interp
    path at module level and runs one multi-level merge with heavy key
    TIES (span=4) — the adversarial case where the proportional estimate
    is useless and correctness must come from the guaranteed bisection
    rounds. e is unique to this test so the jit cache cannot serve a trace
    made under the pinned constants."""
    from wgpu_3dgs_viewer_app_tpu.ops import sort as S

    monkeypatch.setattr(S, "SPLIT_INTERP", True)
    monkeypatch.setattr(S, "SPLIT_ARY", 2)
    e = 6 * BLOCK
    k, p1, p2, p3 = _mk(e, 0.3, 4, seed=11)
    outs = merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                      interpret=True)
    _check(k, p1, p2, p3, *outs)


@pytest.mark.slow
def test_merge_sort_max_levels_truncation():
    """max_levels (bench instrumentation) runs a PREFIX of the level loop:
    after 1 of the 2 levels at 4 phase-1 runs, run 0 = runs 0+1 merged; the
    post-loop sentinel restore keeps only run 0, so its live prefix must be
    the sorted union of runs 0-1's live keys. Geometry derives from
    `_plan_block_sort` so the test tracks the fused-cell run size."""
    from wgpu_3dgs_viewer_app_tpu.ops.sort import LANES, _plan_block_sort

    e = 16 * BLOCK
    run = _plan_block_sort(e)[2] * LANES
    assert e // run >= 4, (e, run)  # needs >= 2 levels for a true prefix
    k, p1, p2, p3 = _mk(e, 0.4, 1 << 24)
    ks = np.asarray(
        merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                   interpret=True, max_levels=1)[0]
    ).ravel()
    first_pair = k[: 2 * run]
    live = np.sort(first_pair[first_pair != SENT])
    assert np.array_equal(ks[: live.shape[0]], live)
    assert np.all(ks[live.shape[0]:] == SENT)


def test_merge_sort_all_sentinel():
    e = 4 * BLOCK
    k = np.full(e, SENT, np.uint32)
    p = np.arange(e, dtype=np.uint32)
    ks = np.asarray(merge_sort(*(jnp.asarray(a) for a in (k, p, p, p)),
                               interpret=True)[0])
    assert np.all(ks == SENT)


def test_merge_sort_interleaved_interpret():
    """interleaved=True must return (flat_keys, (R, 4, 128)) with plane 0
    duplicating the keys and payloads travelling with their key. The
    interleave happens in the LAST merge level, so e must leave >= 2
    phase-1 runs (a single fused cell sorts fully in phase 1 and returns
    the plain 4-tuple — callers handle both shapes)."""
    from wgpu_3dgs_viewer_app_tpu.ops.sort import LANES, _plan_block_sort

    e = 8 * BLOCK
    assert e // (_plan_block_sort(e)[2] * LANES) >= 2, e
    k, p1, p2, p3 = _mk(e, 0.4, 1 << 20, seed=5)
    out = merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                     interpret=True, interleaved=True)
    assert len(out) == 2
    sk, inter = np.asarray(out[0]), np.asarray(out[1])
    assert inter.ndim == 3 and inter.shape[1] == 4 and inter.shape[2] == 128
    nlive = int((k != SENT).sum())
    assert np.array_equal(np.sort(k[k != SENT]), sk[:nlive])
    assert np.all(sk[nlive:] == SENT)
    # interleaved plane 0 rows must equal the flat keys (within live rows)
    live_rows = nlive // 128
    assert np.array_equal(inter[:live_rows, 0, :].ravel(), sk[: live_rows * 128])
    # payload pairing via interleaved plane 1 (p1 = unique ids)
    s1 = inter[:, 1, :].ravel()[:nlive]
    want = sorted(zip(k[k != SENT].tolist(), p1[k != SENT].tolist()))
    got = sorted(zip(sk[:nlive].tolist(), s1.tolist()))
    assert want == got


@pytest.mark.parametrize("span", [1, 2])
def test_merge_sort_massive_key_ties(span):
    """Degenerate key entropy (all keys equal / two values): merge-path
    rank splits break ties by COUNT, and giant tie blocks must still pair
    every key with a payload exactly once (real scenes hit this when many
    entries share one tile + quantized depth bucket). fuse_l1=False so 4
    blocks still reach TWO merge levels (composing tie splits) — fused,
    this size is a single phase-1 cell with no splits at all."""
    e = 4 * BLOCK
    k, p1, p2, p3 = _mk(e, 0.3, span, seed=11)
    outs = merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                      interpret=True, fuse_l1=False)
    _check(k, p1, p2, p3, *outs)


def test_merge_sort_extreme_live_skew():
    """All live entries concentrated in one block, the rest pure sentinel:
    the ragged level descriptors see empty runs (stored == live == 0) at
    every level and must still compact/merge correctly. fuse_l1=False:
    8 blocks -> 8 runs -> 3 levels of empty-run descriptors."""
    e = 8 * BLOCK
    rng = np.random.default_rng(13)
    k = np.full(e, SENT, np.uint32)
    k[:BLOCK] = rng.integers(0, 1 << 24, BLOCK, dtype=np.uint32)
    p1 = np.arange(e, dtype=np.uint32)
    p2 = rng.integers(0, 2**32, e, dtype=np.uint32)
    p3 = rng.integers(0, 2**32, e, dtype=np.uint32)
    outs = merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                      interpret=True, fuse_l1=False)
    _check(k, p1, p2, p3, *outs)


def test_merge_sort_live_tail_only():
    """Mirror skew: live entries only in the LAST block (descending-parity
    run), sentinels ahead of them — the asc/desc alternation and window
    clipping must not drop the tail run's entries. fuse_l1=False for the
    same multi-level descriptor coverage as the skew test above."""
    e = 8 * BLOCK
    rng = np.random.default_rng(17)
    k = np.full(e, SENT, np.uint32)
    k[-BLOCK:] = rng.integers(0, 1 << 24, BLOCK, dtype=np.uint32)
    p1 = np.arange(e, dtype=np.uint32)
    p2 = rng.integers(0, 2**32, e, dtype=np.uint32)
    p3 = rng.integers(0, 2**32, e, dtype=np.uint32)
    outs = merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                      interpret=True, fuse_l1=False)
    _check(k, p1, p2, p3, *outs)
