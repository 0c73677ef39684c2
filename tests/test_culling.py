"""Unit tests for the exact ellipse-vs-tile culling math (ops/binning.py:
`_tight_cull_params` + the per-cell min-quadratic test).

The culling contract (see the binning docstrings): a (splat, tile) candidate
is kept iff min over the tile rect of q(d) = a dx^2 + 2b dx dy + c dy^2 is
<= cut2, with cut2 = radius^2 * lambda_min(conic). These tests pin the
closed forms against brute force.
"""

import numpy as np
import jax.numpy as jnp

from wgpu_3dgs_viewer_app_tpu.core.f16 import f32_to_f16_bits, pack2xf16
from wgpu_3dgs_viewer_app_tpu.ops.binning import (
    TileConfig,
    _enum_cell,
    _entry_planes_for_cell,
    _tight_cull_params,
)


def _random_conics(n, rng):
    """Random PD conics with aspect ratios up to ~4 and rotations. Sigma is
    kept <= 32 px so the conic entries stay in f16 NORMAL range (1/32^2 ~
    1e-3 >> 6.1e-5); the f16-subnormal giant-splat regime is covered by the
    degenerate-guard behavior in _tight_cull_params, not this precision
    test."""
    s1 = rng.uniform(0.5, 8.0, n)
    s2 = s1 * rng.uniform(1.0, 4.0, n)
    th = rng.uniform(0, np.pi, n)
    ct, st = np.cos(th), np.sin(th)
    # conic = R diag(1/s1^2, 1/s2^2) R^T
    ia, ib = 1.0 / s1**2, 1.0 / s2**2
    a = ct * ct * ia + st * st * ib
    c = st * st * ia + ct * ct * ib
    b = ct * st * (ia - ib)
    return a.astype(np.float32), b.astype(np.float32), c.astype(np.float32), np.maximum(s1, s2)


def _pack(a, b, c):
    p2 = np.asarray(pack2xf16(jnp.asarray(a), jnp.asarray(b)))
    p3 = np.asarray(f32_to_f16_bits(jnp.asarray(c)))
    return jnp.asarray(p2), jnp.asarray(p3)


def test_cut2_reproduces_mode_semantics():
    """cut2 = r^2 * lambda_min: equals 2*ln(alpha/eps) when radius was built
    as sigma_max * cut (splat mode), and 4 when radius = 2*sigma_max
    (ellipse mode) or for the point-mode synthetic conic."""
    rng = np.random.default_rng(0)
    a, b, c, smax = _random_conics(256, rng)
    p2, p3 = _pack(a, b, c)
    # f16-decode the conic exactly as the culling does, then compute the
    # reference lambda via numpy eigenvalues of the decoded values.
    from wgpu_3dgs_viewer_app_tpu.core.f16 import f16_bits_to_f32, unpack2xf16

    af, bf = (np.asarray(x) for x in unpack2xf16(p2))
    cf = np.asarray(f16_bits_to_f32(p3 & jnp.uint32(0xFFFF)))
    lam_min = np.array([
        np.linalg.eigvalsh(np.array([[af[i], bf[i]], [bf[i], cf[i]]]))[0]
        for i in range(len(af))
    ])
    sig_max = 1.0 / np.sqrt(lam_min)

    # Splat mode: radius = sigma_max * cut for a chosen alpha.
    alpha = rng.uniform(0.05, 0.99, 256).astype(np.float32)
    cut = np.sqrt(2.0 * np.maximum(np.log(alpha * 255.0), 0.0))
    r_splat = (sig_max * cut).astype(np.float32)
    (cut2, *_), rx, ry = _tight_cull_params(jnp.asarray(r_splat), p2, p3)
    np.testing.assert_allclose(np.asarray(cut2), cut * cut, rtol=2e-3, atol=1e-4)

    # Ellipse mode: radius = 2 * sigma_max -> cut2 = 4.
    (cut2e, *_), _, _ = _tight_cull_params(
        jnp.asarray((2.0 * sig_max).astype(np.float32)), p2, p3
    )
    keep = cut > 0.1  # splats with near-zero live extent lose precision
    np.testing.assert_allclose(np.asarray(cut2e)[keep], 4.0, rtol=2e-3)

    # Invalid splats (signed radius <= 0) always get cut2 = -1.
    (cut2i, *_), _, _ = _tight_cull_params(jnp.zeros_like(p3, jnp.float32), p2, p3)
    assert (np.asarray(cut2i) == -1.0).all()

    # AABB half-extents bound the cut ellipse and sit inside the circle.
    assert (np.asarray(rx) <= r_splat + 1e-3).all()
    assert (np.asarray(ry) <= r_splat + 1e-3).all()


def test_aabb_extents_bound_the_cut_ellipse():
    """Sampled boundary points of {q = cut2} stay inside [-rx, rx] x
    [-ry, ry], and the AABB is tight to ~f16 precision."""
    rng = np.random.default_rng(1)
    a, b, c, smax = _random_conics(64, rng)
    p2, p3 = _pack(a, b, c)
    r = (smax * 2.0).astype(np.float32)  # cut = 2 sigma
    (cut2, af, bf, cf, _, _), rx, ry = _tight_cull_params(jnp.asarray(r), p2, p3)
    cut2, rx, ry = (np.asarray(x) for x in (cut2, rx, ry))
    af, bf, cf = (np.asarray(x) for x in (af, bf, cf))
    th = np.linspace(0, 2 * np.pi, 720)
    for i in range(64):
        # Parameterize the boundary: x = k*cos, y = k*sin with
        # k^2 = cut2 / q(cos, sin).
        q = af[i] * np.cos(th) ** 2 + 2 * bf[i] * np.cos(th) * np.sin(th) + cf[i] * np.sin(th) ** 2
        k = np.sqrt(cut2[i] / q)
        bx = np.abs(k * np.cos(th)).max()
        by = np.abs(k * np.sin(th)).max()
        assert bx <= rx[i] * 1.001 + 1e-3
        assert by <= ry[i] * 1.001 + 1e-3
        assert bx >= rx[i] * 0.99 - 1e-3  # tight, not just an upper bound
        assert by >= ry[i] * 0.99 - 1e-3


def test_cell_test_matches_bruteforce_min():
    """The 4-edge closed-form min over the tile rect == dense-grid brute
    force, across random rects inside and outside the ellipse."""
    rng = np.random.default_rng(2)
    a, b, c, smax = _random_conics(128, rng)
    p2, p3 = _pack(a, b, c)
    r = (smax * 2.5).astype(np.float32)
    cull, rx, ry = _tight_cull_params(jnp.asarray(r), p2, p3)
    cut2, af, bf, cf, inv_a, inv_c = (np.asarray(x) for x in cull)

    cfg = TileConfig(512, 512, tile=32, max_dup=4)
    tile = float(cfg.tile)
    # Place each splat at a random position; test cell d over its rect.
    x = rng.uniform(0, 512, 128).astype(np.float32)
    y = rng.uniform(0, 512, 128).astype(np.float32)
    from wgpu_3dgs_viewer_app_tpu.ops.binning import _splat_rect

    tx0, rw, ty0, rh, n_touched = (
        np.asarray(v)
        for v in _splat_rect(jnp.asarray(x), jnp.asarray(y), rx, ry, cfg)
    )
    for d in range(4):
        key, _ = _entry_planes_for_cell(
            d, jnp.asarray(x), jnp.asarray(y), cull,
            jnp.zeros(128, jnp.uint32), jnp.zeros(128, jnp.uint32),
            jnp.asarray(tx0), jnp.asarray(rw), jnp.asarray(ty0),
            jnp.asarray(rh), jnp.asarray(n_touched), cfg,
        )
        live = np.asarray(key) != 0xFFFFFFFF
        etx, ety = (np.asarray(v) for v in _enum_cell(
            d, jnp.asarray(tx0), jnp.asarray(rw), jnp.asarray(ty0), jnp.asarray(rh)
        ))
        for i in range(128):
            if d >= n_touched[i]:
                assert not live[i]
                continue
            ox, oy = etx[i] * tile, ety[i] * tile
            gx = np.linspace(ox, ox + tile, 65) - x[i]
            gy = np.linspace(oy, oy + tile, 65) - y[i]
            dxg, dyg = np.meshgrid(gx, gy)
            qg = af[i] * dxg**2 + 2 * bf[i] * dxg * dyg + cf[i] * dyg**2
            brute = qg.min()
            # The closed form is exact; the dense grid only overestimates
            # (samples miss the true min by O(step^2)).
            if brute <= cut2[i] * 0.98 - 1e-3:
                assert live[i], (i, d, brute, cut2[i])
            if brute > cut2[i] * 1.02 + 1e-3:
                assert not live[i], (i, d, brute, cut2[i])
