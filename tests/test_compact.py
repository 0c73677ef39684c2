"""Pre-sort sentinel compaction (ops/compact.py) vs a numpy oracle.

The kernel may emit live entries in ANY order (the downstream sort is
order-insensitive), so the oracle checks are set-valued:
  * every live input (key, p1, p2, p3) quad appears exactly once within
    the live prefix,
  * everything else in the prefix is a sentinel,
  * the prefix height matches plan_compact's column-max bound.
"""

import numpy as np
import pytest

from wgpu_3dgs_viewer_app_tpu.ops.compact import (
    CROWS,
    LANES,
    SENTINEL,
    compact_entries,
    plan_compact,
)

CELL = CROWS * LANES


def _planes(e, valid_mask, seed=0):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, 1 << 31, e, dtype=np.uint32)
    k[~valid_mask] = SENTINEL
    p1 = np.arange(e, dtype=np.uint32)  # unique ids: exact multiset check
    p2 = rng.integers(0, 1 << 32, e, dtype=np.uint32)
    p3 = rng.integers(0, 1 << 32, e, dtype=np.uint32)
    return k, p1, p2, p3


def _check(k, p1, p2, p3):
    import jax.numpy as jnp

    e = k.shape[0]
    ko, o1, o2, o3, live_rows = compact_entries(
        *(jnp.asarray(a) for a in (k, p1, p2, p3)), interpret=True)
    live_rows = int(live_rows)
    ko, o1, o2, o3 = (np.asarray(a) for a in (ko, o1, o2, o3))
    n = live_rows * LANES
    out_live = ko[:n] != SENTINEL
    in_live = k != SENTINEL

    # Exact multiset equality via the unique p1 ids.
    got = np.sort(o1[:n][out_live])
    want = np.sort(p1[in_live])
    np.testing.assert_array_equal(got, want)
    # Full quads travel together.
    order_got = np.argsort(o1[:n][out_live])
    order_want = np.argsort(p1[in_live])
    for a_out, a_in in ((ko, k), (o2, p2), (o3, p3)):
        np.testing.assert_array_equal(
            a_out[:n][out_live][order_got], a_in[in_live][order_want])

    # The prefix height matches the XLA plan (<= per-cell column max,
    # 8-row rounded) and the slack inside it is bounded by that rounding.
    import jax.numpy as jnp2
    _, planned = plan_compact(jnp2.asarray(k))
    assert live_rows == int(planned)
    ncells = e // CELL
    vcol = in_live.reshape(ncells, CROWS, LANES).sum(axis=1)
    bound = (((vcol.max(axis=1) + 7) // 8) * 8).sum()
    assert live_rows == bound


@pytest.mark.parametrize("frac", [0.0, 0.2, 0.44, 0.9, 1.0])
def test_compact_random(frac):
    rng = np.random.default_rng(int(frac * 100) + 1)
    valid = rng.random(CELL) >= frac
    _check(*_planes(CELL, valid, seed=3))


def test_compact_multi_cell():
    rng = np.random.default_rng(7)
    valid = rng.random(3 * CELL) >= 0.44
    _check(*_planes(3 * CELL, valid, seed=9))


def test_compact_adversarial_patterns():
    e = CELL
    idx = np.arange(e)
    row = (idx // LANES) % CROWS
    patterns = [
        row % 2 == 0,                      # alternating rows
        row >= CROWS // 2,                 # dead head
        row < CROWS // 2,                  # dead tail
        (idx % 128) == 0,                  # one lane live per row
        row == CROWS - 1,                  # single live row at the bottom
        np.zeros(e, bool),                 # fully dead
        np.ones(e, bool),                  # fully live
    ]
    for i, valid in enumerate(patterns):
        _check(*_planes(e, valid, seed=i))


@pytest.mark.tpu
def test_compact_on_chip_matches_oracle():
    """Compiled Mosaic kernel at the true CROWS on real hardware: the
    overlapping-DMA packing chain and sublane-roll butterfly must reproduce
    the interpret-mode/oracle semantics bit-for-bit (multiset equality of
    live quads within the live prefix)."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    e = 3 * CELL
    valid = rng.random(e) >= 0.44
    k, p1, p2, p3 = _planes(e, valid, seed=4)
    ko, o1, o2, o3, live_rows = compact_entries(
        *(jnp.asarray(a) for a in (k, p1, p2, p3)))
    n = int(live_rows) * LANES
    ko, o1 = np.asarray(ko), np.asarray(o1)
    out_live = ko[:n] != SENTINEL
    np.testing.assert_array_equal(np.sort(o1[:n][out_live]),
                                  np.sort(p1[valid]))
    order_got = np.argsort(o1[:n][out_live])
    order_want = np.argsort(p1[valid])
    np.testing.assert_array_equal(ko[:n][out_live][order_got],
                                  k[valid][order_want])


def test_merge_sort_with_compact_matches_lax():
    """End-to-end: compact=True merge_sort equals lax.sort on the live set
    (interpret mode, bench-shaped sentinel fraction)."""
    import jax
    import jax.numpy as jnp

    from wgpu_3dgs_viewer_app_tpu.ops.sort import merge_sort

    e = 2 * CELL
    rng = np.random.default_rng(11)
    k = rng.integers(0, 1 << 20, e, dtype=np.uint32)
    k[rng.random(e) < 0.44] = SENTINEL
    p1 = np.arange(e, dtype=np.uint32)
    p2 = rng.integers(0, 1 << 32, e, dtype=np.uint32)
    p3 = rng.integers(0, 1 << 32, e, dtype=np.uint32)

    ks, s1, s2, s3 = merge_sort(*(jnp.asarray(a) for a in (k, p1, p2, p3)),
                                interpret=True, compact=True, fuse_l1=False)
    ks = np.asarray(ks)
    live = ks != SENTINEL
    ref = jax.lax.sort(tuple(jnp.asarray(a) for a in (k, p1, p2, p3)),
                       num_keys=1, is_stable=False)
    rk = np.asarray(ref[0])
    rlive = rk != SENTINEL
    np.testing.assert_array_equal(ks[live], rk[rlive])
    # Payload sets agree per key (ties may reorder; compare sorted quads).
    got = np.stack([np.asarray(a)[live] for a in (ks, s1, s2, s3)], 1)
    want = np.stack([np.asarray(a)[rlive] for a in ref], 1)
    got = got[np.lexsort(got.T[::-1])]
    want = want[np.lexsort(want.T[::-1])]
    np.testing.assert_array_equal(got, want)
