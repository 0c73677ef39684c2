"""Native codec tests: gsnative pack vs the numpy reference path."""

import numpy as np
import pytest

from wgpu_3dgs_viewer_app_tpu.data import ALL_COMPRESSIONS, make_random_scene, pack_gaussians
from wgpu_3dgs_viewer_app_tpu.data import native as gsnative


def _build_if_needed():
    if gsnative.available():
        return True
    try:
        from wgpu_3dgs_viewer_app_tpu.native.build import build

        build(verbose=False)
        gsnative._lib = None  # force reload
        return gsnative.available()
    except Exception:
        return False


needs_native = pytest.mark.skipif(not _build_if_needed(), reason="gsnative not buildable")


@needs_native
@pytest.mark.parametrize("comp", ALL_COMPRESSIONS, ids=lambda c: f"{c.sh.value}-{c.cov3d.value}")
def test_native_pack_matches_numpy(comp):
    g = make_random_scene(5000, seed=11)
    # The native codec emits the intermediate FLAT layout; pod_rows converts
    # to the device rows layout afterwards (data/compression.py).
    ref = pack_gaussians(g, comp, use_native=False, layout="flat")
    out = gsnative.pack_gaussians_native(g, comp)
    assert set(out) == set(ref)
    np.testing.assert_array_equal(out["pos"], ref["pos"])
    # u8 quantization: allow 1 count of difference per channel (packed u32).
    for shift in (0, 8, 16, 24):
        a = (out["color0"] >> shift) & 0xFF
        b = (ref["color0"] >> shift) & 0xFF
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 1
    if "sh" in ref:
        if ref["sh"].dtype == np.uint8:
            assert np.abs(out["sh"].astype(int) - ref["sh"].astype(int)).max() <= 1
            np.testing.assert_allclose(out["sh_mn"], ref["sh_mn"], rtol=1e-6)
            np.testing.assert_allclose(out["sh_span"], ref["sh_span"], rtol=1e-6)
        else:
            np.testing.assert_allclose(
                out["sh"].astype(np.float32), ref["sh"].astype(np.float32), atol=1e-6
            )
    np.testing.assert_allclose(
        out["cov3d"].astype(np.float32), ref["cov3d"].astype(np.float32),
        rtol=1e-3, atol=1e-6,
    )


@needs_native
def test_native_pack_multithreaded_consistent():
    g = make_random_scene(20000, seed=12)
    comp = ALL_COMPRESSIONS[0]
    a = gsnative.pack_gaussians_native(g, comp, n_threads=1)
    b = gsnative.pack_gaussians_native(g, comp, n_threads=8)
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
