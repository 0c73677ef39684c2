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
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-extent, extent, size=(n, 3)).astype(np.float32)
    # Base colors spread over the cube for visual structure.
    sh0 = (((pos / extent) * 0.5 + rng.normal(0, 0.15, (n, 3))) / 0.28209479177387814).astype(
        np.float32
    )
    sh_rest = rng.normal(0.0, sh_rest_std, size=(n, 15, 3)).astype(np.float32)
    opacity = inverse_sigmoid(rng.uniform(0.3, 0.95, size=n)).astype(np.float32)
    scale = np.log(rng.uniform(scale_range[0], scale_range[1], size=(n, 3))).astype(np.float32)
    rot = rng.normal(size=(n, 4)).astype(np.float32)
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
