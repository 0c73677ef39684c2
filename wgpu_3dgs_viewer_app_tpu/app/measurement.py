"""Measurement: hit pairs, distances, and the line overlay renderer.

Parity with reference:
- `Measurement` / `MeasurementHitPair` / `MeasurementHit` state and
  `distance()` (`src/app.rs:1345-1421`; default color red, line width 1).
- Hit methods {MostAlpha (default), Closest} (`src/app.rs:1363-1371`),
  resolved by query/hit.py.
- Line overlay: the reference draws instanced screen-space-width 3D line
  segments with its own wgpu pipeline + WGSL shader
  (`src/renderer/measurement.rs:16-174`, `src/shader/measurement.wgsl:22-67`:
  6 vertices per segment expanded perpendicular to the projected direction,
  depth-tested). Here the overlay is a vectorized jnp rasterizer that draws
  all segments over the composited frame in one fused pass — same visual
  contract (screen-space width, per-pair color) re-expressed as array math.
"""

from __future__ import annotations

import dataclasses
from typing import List

import jax.numpy as jnp
import numpy as np

from ..core.lines import project_points as _project_points, rasterize_lines
from ..query.hit import MeasurementHitMethod


@dataclasses.dataclass
class MeasurementHit:
    """Ref `MeasurementHit` (`src/app.rs:1411-1421`)."""

    pos: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3, np.float32))


@dataclasses.dataclass
class MeasurementHitPair:
    """Ref `MeasurementHitPair` (`src/app.rs:1373-1409`)."""

    label: str
    visible: bool = True
    color: tuple = (1.0, 0.0, 0.0, 1.0)  # ref default Color32::RED
    line_width: float = 1.0
    hits: List[MeasurementHit] = dataclasses.field(
        default_factory=lambda: [MeasurementHit(), MeasurementHit()]
    )

    def distance(self) -> float:
        """Ref `distance` (`src/app.rs:1404-1408`)."""
        return float(np.linalg.norm(self.hits[0].pos - self.hits[1].pos))


@dataclasses.dataclass
class Measurement:
    """Ref `Measurement` (`src/app.rs:1345-1360`)."""

    hit_pairs: List[MeasurementHitPair] = dataclasses.field(default_factory=list)
    hit_method: MeasurementHitMethod = MeasurementHitMethod.MOST_ALPHA


def render_measurement_overlay(
    img: jnp.ndarray,
    measurement: Measurement,
    view: np.ndarray,
    proj: np.ndarray,
) -> jnp.ndarray:
    """Composite visible hit-pair lines over a rendered frame.

    Equivalent of `renderer::Measurement::render` drawing 6 verts per pair
    (`src/renderer/measurement.rs:169-174`).
    """
    pairs = [p for p in measurement.hit_pairs if p.visible]
    if not pairs:
        return img
    h, w = img.shape[:2]
    pts = np.array(
        [[p.hits[0].pos, p.hits[1].pos] for p in pairs], np.float32
    ).reshape(-1, 3)
    px, _, in_front = _project_points(
        jnp.asarray(pts), jnp.asarray(view), jnp.asarray(proj), w, h
    )
    px = px.reshape(-1, 2, 2)
    ok = in_front.reshape(-1, 2)
    a = px[:, 0]
    b = px[:, 1]
    colors = jnp.asarray([p.color for p in pairs], jnp.float32)
    widths = jnp.asarray([p.line_width for p in pairs], jnp.float32)
    live = ok[:, 0] & ok[:, 1]
    return rasterize_lines(img, a, b, colors, widths, live)
