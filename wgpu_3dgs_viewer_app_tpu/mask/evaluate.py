"""Mask evaluation: set-op tree over shape containments -> per-splat bits.

Parity with the crate's `MaskEvaluator::evaluate(device, queue, tree,
mask_buffer, model_transform, gaussians)` (reference
`src/tab/scene.rs:2033-2034,2201-2209`): evaluates the op tree per splat into
the mask bit buffer, which then gates splats out of the draw every frame
(mask bound into preprocess, `src/tab/scene.rs:1851`).

TPU design: the whole tree folds into one fused XLA elementwise expression —
each Shape leaf is a vectorized containment test, each node a boolean op.
`MaskOpTree::Reset` (SURVEY §2.2) sets all bits.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from ..core.transform import ModelTransform
from .expr import MaskOp
from .shapes import MaskOpShapePod, shape_contains


class MaskEvaluator:
    """Evaluates a mask op tree against one model's splat centers."""

    def evaluate(
        self,
        op: Optional[MaskOp],
        shapes: Sequence[MaskOpShapePod],
        positions: jnp.ndarray,
        model_transform: Optional[ModelTransform] = None,
    ) -> jnp.ndarray:
        """Returns (N,) uint8 mask bits (1 = keep).

        `op=None` is Reset: all splats visible (ref
        `SceneCommand::EvaluateMask(None)` path, `src/tab/scene.rs:447-456`).
        Shape pods are in world space; splat positions are model-local, so the
        model transform is applied first (mirrors the crate taking the
        `model_transform_buffer`, `src/tab/scene.rs:2201-2209`).
        """
        n = positions.shape[0]
        if op is None:
            return jnp.ones(n, jnp.uint8)
        if model_transform is not None:
            m = model_transform.matrix()
            positions = positions @ jnp.asarray(m[:3, :3]).T + jnp.asarray(m[:3, 3])
        return self._eval(op, shapes, positions).astype(jnp.uint8)

    def _eval(self, op: MaskOp, shapes, pts) -> jnp.ndarray:
        k = op.kind
        if k == "shape":
            return shape_contains(shapes[op.index], pts)
        if k == "complement":
            return ~self._eval(op.left, shapes, pts)
        a = self._eval(op.left, shapes, pts)
        b = self._eval(op.right, shapes, pts)
        if k == "union":
            return a | b
        if k == "intersection":
            return a & b
        if k == "difference":
            return a & ~b
        if k == "symmetric_difference":
            return a ^ b
        raise ValueError(f"unknown mask op kind {k!r}")


def evaluate_mask_numpy(
    op: Optional[MaskOp],
    shapes: Sequence[MaskOpShapePod],
    positions: np.ndarray,
    model_transform: Optional[ModelTransform] = None,
) -> np.ndarray:
    """Host-side convenience wrapper returning numpy bits."""
    return np.asarray(
        MaskEvaluator().evaluate(op, shapes, jnp.asarray(positions), model_transform)
    )
