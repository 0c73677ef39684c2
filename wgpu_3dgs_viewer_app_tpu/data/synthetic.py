"""Synthetic splat scenes for tests and benchmarks.

BASELINE config 0 uses a synthetic ~50k-Gaussian PLY (CPU-runnable reference
render); the bench harness scales the same generator to ~6M splats for the
1080p target (BASELINE.json configs).
"""

from __future__ import annotations

import numpy as np

from .gaussian import Gaussians, inverse_sigmoid


def make_random_scene(
    n: int,
    seed: int = 0,
    extent: float = 3.0,
    scale_range: tuple = (0.005, 0.05),
    sh_rest_std: float = 0.08,
) -> Gaussians:
    """Random cloud of anisotropic splats inside a cube of +-extent."""
    # SFC64 + float32 draws: default PCG64/f64 generation is ~5x slower and
    # dominates setup at 6M splats.
    rng = np.random.Generator(np.random.SFC64(seed))

    def uni(lo, hi, shape):
        return (rng.random(shape, dtype=np.float32) * (hi - lo) + lo)

    pos = uni(-extent, extent, (n, 3))
    # Base colors spread over the cube for visual structure.
    sh0 = ((pos / max(extent, 1e-6)) * 0.5 + rng.standard_normal((n, 3), dtype=np.float32) * 0.15) / np.float32(
        0.28209479177387814
    )
    sh_rest = rng.standard_normal((n, 15, 3), dtype=np.float32) * np.float32(sh_rest_std)
    opacity = inverse_sigmoid(uni(0.3, 0.95, (n,))).astype(np.float32)
    scale = np.log(uni(scale_range[0], scale_range[1], (n, 3)))
    rot = rng.standard_normal((n, 4), dtype=np.float32)
    rot /= np.linalg.norm(rot, axis=1, keepdims=True)
    # (w, x, y, z) with w kept positive for canonical form.
    rot[:, 0] = np.abs(rot[:, 0])
    normal = np.zeros((n, 3), np.float32)
    return Gaussians(pos, normal, sh0, sh_rest, opacity, scale, rot)


def make_grid_scene(side: int = 8, spacing: float = 0.5, scale: float = 0.08) -> Gaussians:
    """Small deterministic grid of isotropic splats (golden tests)."""
    xs = (np.arange(side) - (side - 1) / 2) * spacing
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    pos = np.stack([gx, gy, gz], axis=-1).reshape(-1, 3).astype(np.float32)
    n = pos.shape[0]
    g = make_random_scene(n, seed=1)
    g.pos = pos
    g.scale = np.full((n, 3), np.log(scale), np.float32)
    g.rot = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    return g
