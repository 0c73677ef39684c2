"""3D covariance construction and EWA projection to 2D conics, jnp.

The engine crate computes these in its WGSL preprocess shader (pipeline stage
at reference `src/tab/scene.rs:856-863`; crate-internal, mechanics standard
EWA splatting / Inria 3DGS math).

Conventions (this framework):
- view matrix is glam `look_at_rh` (camera looks down -Z); depth = -z_view.
- projection is glam `perspective_rh` (NDC y up, z in [0,1]).
- pixel coords: x right, y DOWN (top-left origin), so the y row of the
  projection Jacobian is negated.

All functions are vectorized over the leading splat axis and fuse into the
surrounding preprocess under jit.
"""

from __future__ import annotations

import jax.numpy as jnp

# Screen-space low-pass filter added to the projected covariance (standard
# EWA anti-aliasing dilation used by 3DGS renderers).
COV2D_DILATION = 0.3


def quat_to_mat3_jnp(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion (w, x, y, z), possibly unnormalized -> (..., 3, 3) rotation."""
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1)
    row1 = jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1)
    row2 = jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1)
    return jnp.stack([row0, row1, row2], -2)


def cov3d_from_scale_rot(scale: jnp.ndarray, quat: jnp.ndarray) -> jnp.ndarray:
    """Sigma = R S S^T R^T, packed as 6 uniques (xx, xy, xz, yy, yz, zz).

    `scale`: (..., 3) linear scales (PLY stores log-scale; exp() upstream).
    `quat`: (..., 4) (w, x, y, z).
    """
    r = quat_to_mat3_jnp(quat)
    m = r * scale[..., None, :]  # R @ diag(s)
    sigma = m @ jnp.swapaxes(m, -1, -2)
    return jnp.stack(
        [
            sigma[..., 0, 0],
            sigma[..., 0, 1],
            sigma[..., 0, 2],
            sigma[..., 1, 1],
            sigma[..., 1, 2],
            sigma[..., 2, 2],
        ],
        axis=-1,
    )


def unpack_cov3d(cov6: jnp.ndarray) -> jnp.ndarray:
    """(..., 6) packed uniques -> (..., 3, 3) symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    return jnp.stack(
        [
            jnp.stack([xx, xy, xz], -1),
            jnp.stack([xy, yy, yz], -1),
            jnp.stack([xz, yz, zz], -1),
        ],
        -2,
    )


def project_cov3d_to_cov2d(
    cov6: jnp.ndarray,
    t_view: jnp.ndarray,
    view3: jnp.ndarray,
    focal: tuple,
    tan_half_fov: tuple,
) -> jnp.ndarray:
    """EWA projection: 3D covariance -> 2D screen-space covariance.

    cov6:   (N, 6) packed world-space covariance.
    t_view: (N, 3) splat centers in view space (camera looks down -Z).
    view3:  (3, 3) rotation part of the view matrix.
    focal:  (fx, fy) focal lengths in pixels.
    tan_half_fov: (tan_fov_x/2, tan_fov_y/2) for center clamping.
    Returns (N, 3): (a, b, c) of the symmetric 2D covariance
    [[a, b], [b, c]] in pixel^2 (y down), including the low-pass dilation.
    """
    fx, fy = focal
    tx, ty, tz = t_view[..., 0], t_view[..., 1], t_view[..., 2]
    d = -tz  # positive depth in front of camera
    d = jnp.maximum(d, 1e-6)

    # Clamp the projected center to ~1.3x the frustum to bound the Jacobian
    # at grazing angles (standard 3DGS trick).
    limx, limy = 1.3 * tan_half_fov[0], 1.3 * tan_half_fov[1]
    txc = jnp.clip(tx / d, -limx, limx) * d
    tyc = jnp.clip(ty / d, -limy, limy) * d

    inv_d = 1.0 / d
    inv_d2 = inv_d * inv_d
    # J rows: dx_px/d(view), dy_px/d(view); y negated for y-down pixels.
    zeros = jnp.zeros_like(d)
    j0 = jnp.stack([fx * inv_d, zeros, fx * txc * inv_d2], -1)
    j1 = jnp.stack([zeros, -fy * inv_d, -fy * tyc * inv_d2], -1)
    J = jnp.stack([j0, j1], -2)  # (N, 2, 3)

    sigma = unpack_cov3d(cov6)  # (N, 3, 3)
    JW = J @ view3  # (N, 2, 3)
    cov2d = JW @ sigma @ jnp.swapaxes(JW, -1, -2)  # (N, 2, 2)
    a = cov2d[..., 0, 0] + COV2D_DILATION
    b = cov2d[..., 0, 1]
    c = cov2d[..., 1, 1] + COV2D_DILATION
    return jnp.stack([a, b, c], -1)


def cov2d_to_conic_radius(cov2d: jnp.ndarray) -> tuple:
    """2D covariance (a, b, c) -> (conic (A, B, C), radius_px, valid_det).

    conic = inverse covariance; radius = 3 * sqrt(max eigenvalue).
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    det = a * c - b * b
    valid = det > 0.0
    inv_det = jnp.where(valid, 1.0 / jnp.maximum(det, 1e-12), 0.0)
    conic = jnp.stack([c * inv_det, -b * inv_det, a * inv_det], -1)
    mid = 0.5 * (a + c)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det, 0.1))
    lambda1 = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda1, 0.0)))
    return conic, radius, valid
