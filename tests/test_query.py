"""Query subsystem tests: hit picking, rect/brush selection, toolset modes."""

import numpy as np

import jax.numpy as jnp

from wgpu_3dgs_viewer_app_tpu.core import CameraOrbitControl
from wgpu_3dgs_viewer_app_tpu.data import (
    Compressions,
    Cov3dCompression,
    ShCompression,
    make_random_scene,
    pack_gaussians,
)
from wgpu_3dgs_viewer_app_tpu.ops import preprocess
from wgpu_3dgs_viewer_app_tpu.query import (
    MeasurementHitMethod,
    QueryBrushPod,
    QueryRectPod,
    QuerySelectionOp,
    QueryToolset,
    apply_query_pod,
    combine_selection,
    query_hit,
    sample_texture_at_centers,
    select_rect,
)

W = H = 128
FULL = Compressions(ShCompression.SINGLE, Cov3dCompression.SINGLE)


def two_splat_scene():
    """Two big opaque splats: one at origin (near), one behind it (far)."""
    g = make_random_scene(2, seed=0, extent=0.0, scale_range=(0.2, 0.2001))
    g.pos = np.array([[0, 0, 0], [0, 0, 2.0]], np.float32)  # cam at -4 looks +z
    g.opacity[:] = 4.0  # sigmoid ~ 0.98
    g.rot = np.tile(np.array([1, 0, 0, 0], np.float32), (2, 1))
    pod = {k: jnp.asarray(v) for k, v in pack_gaussians(g, FULL).items()}
    cam = CameraOrbitControl(target=(0, 0, 0), pos=(0, 0, -4))
    view = jnp.asarray(cam.view())
    proj = jnp.asarray(cam.projection(1.0))
    pre = preprocess(pod, FULL, view, proj, jnp.eye(4), W, H)
    return pre, view, proj


def test_hit_closest_and_most_alpha():
    pre, view, proj = two_splat_scene()
    center = jnp.asarray([W / 2, H / 2], jnp.float32)
    found, pos = query_hit(pre, center, view, proj, W, H, MeasurementHitMethod.CLOSEST)
    assert bool(found)
    # nearest splat is at z=0 (4 units from camera at z=-4)
    np.testing.assert_allclose(np.asarray(pos), [0, 0, 0], atol=0.05)
    found2, pos2 = query_hit(pre, center, view, proj, W, H, MeasurementHitMethod.MOST_ALPHA)
    assert bool(found2)
    # front splat has alpha .98 -> wins most-alpha too
    np.testing.assert_allclose(np.asarray(pos2), [0, 0, 0], atol=0.05)


def test_hit_miss():
    pre, view, proj = two_splat_scene()
    corner = jnp.asarray([2.0, 2.0], jnp.float32)
    found, _ = query_hit(pre, corner, view, proj, W, H, MeasurementHitMethod.CLOSEST)
    assert not bool(found)


def grid_scene():
    g = make_random_scene(100, seed=1, extent=0.0, scale_range=(0.02, 0.03))
    xs = np.linspace(-1, 1, 10)
    gx, gy = np.meshgrid(xs, xs)
    g.pos = np.stack([gx.ravel(), gy.ravel(), np.zeros(100)], -1).astype(np.float32)
    pod = {k: jnp.asarray(v) for k, v in pack_gaussians(g, FULL).items()}
    cam = CameraOrbitControl(target=(0, 0, 0), pos=(0, 0, -4))
    view = jnp.asarray(cam.view())
    proj = jnp.asarray(cam.projection(1.0))
    pre = preprocess(pod, FULL, view, proj, jnp.eye(4), W, H)
    return g, pre


def test_select_rect_halves():
    g, pre = grid_scene()
    # Camera sits at -Z looking at the origin, so world +X appears on the
    # LEFT of the screen (mirrored view, right-handed look_at).
    bits = np.asarray(select_rect(pre, (0, 0), (W / 2, H)))
    got = set(np.nonzero(bits)[0].tolist())
    expect = set(np.nonzero(g.pos[:, 0] > 0.01)[0].tolist())
    assert got == expect


def test_selection_ops_combine():
    old = jnp.asarray(np.array([1, 1, 0, 0], np.uint8))
    new = jnp.asarray(np.array([1, 0, 1, 0], np.uint8))
    np.testing.assert_array_equal(
        np.asarray(combine_selection(old, new, QuerySelectionOp.SET)), [1, 0, 1, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(combine_selection(old, new, QuerySelectionOp.ADD)), [1, 1, 1, 0]
    )
    np.testing.assert_array_equal(
        np.asarray(combine_selection(old, new, QuerySelectionOp.REMOVE)), [0, 1, 0, 0]
    )


def test_brush_segment_selection():
    g, pre = grid_scene()
    # Stroke along the horizontal center line with a thin radius: selects the
    # middle rows only.
    bits = np.zeros(100, np.uint8)
    pod = QueryBrushPod((0, H / 2), (W, H / 2), 8.0, QuerySelectionOp.SET)
    bits = np.asarray(apply_query_pod(pre, jnp.asarray(bits), pod))
    rows = np.abs(g.pos[:, 1]) < 0.15
    got = set(np.nonzero(bits)[0].tolist())
    assert got and got.issubset(set(np.nonzero(rows)[0].tolist()))


def test_toolset_immediate_rect_gesture():
    g, pre = grid_scene()
    ts = QueryToolset(W, H)
    ts.set_use_texture(False)
    ts.start(QueryToolset.RECT, QuerySelectionOp.SET, (0, 0))
    ts.update_pos((W / 2, H))
    ts.end()
    pods = ts.query()
    assert len(pods) == 1 and isinstance(pods[0], QueryRectPod)
    bits = jnp.zeros(100, jnp.uint8)
    for p in pods:
        bits = apply_query_pod(pre, bits, p)
    assert np.asarray(bits).sum() > 0


def test_toolset_texture_brush_gesture():
    g, pre = grid_scene()
    ts = QueryToolset(W, H)
    ts.set_use_texture(True)
    ts.update_brush_radius(8)
    ts.start(QueryToolset.BRUSH, QuerySelectionOp.SET, (0, H / 2))
    ts.update_pos((W, H / 2))
    result = ts.end()
    assert result is not None
    op, tex = result
    bits = sample_texture_at_centers(pre, tex)
    merged = combine_selection(jnp.zeros(bits.shape[0], jnp.uint8), bits, op)
    got = np.asarray(merged)[: g.count]  # trim the pod's lane padding
    assert got.sum() > 0
    assert (np.abs(g.pos[got.astype(bool), 1]) < 0.2).all()


def test_toolset_brush_set_does_not_erase_own_path():
    ts = QueryToolset(W, H)
    ts.set_use_texture(False)
    ts.start(QueryToolset.BRUSH, QuerySelectionOp.SET, (10, 10))
    ts.update_pos((50, 10))
    ts.update_pos((90, 10))
    pods = ts.query()
    assert pods[0].op == QuerySelectionOp.SET
    assert all(p.op == QuerySelectionOp.ADD for p in pods[1:])
