"""On-the-fly quantized compression configs (the `GaussianPod` system).

Parity with reference:
- 8 concrete pod layouts `GaussianPodWithSh{Single|Half|Norm8|None}Cov3d
  {Single|Half}Configs` — dispatch at `src/tab/scene.rs:23-81`, size math at
  `src/app.rs:352-384`.
- Field split: position f32x3 and color u8x4 uncompressed; SH rest and cov3d
  compressed per config (`src/tab/scene.rs:907-1006`).
- Defaults: SH Norm8 + Cov3d Half (`src/app.rs:398-417`).

TPU-native design: the Rust crate monomorphizes 8 pod struct layouts at
compile time. Here a config is *data* — per-field dtype policy on a pytree of
device arrays. jit re-specializes the render function per dtype combination,
which is the XLA equivalent of monomorphization, with zero macro machinery.

Device layout per model (struct of arrays, SPLAT AXIS LAST — small leading
dims keep layouts compact on TPU; (N, k<128) arrays lane-pad up to 32x):
  pos      (3, N) f32
  color0   (N,) u32    — packed r|g<<8|b<<16|a<<24; rgb = clamp(0.5+C0*sh0),
                         a = sigmoid(opacity), all u8
  sh       SH-rest coefficients per config (coeff-major):
             SINGLE (45, N) f32 | HALF (45, N) f16 | NORM8 (45, N) u8 +
             sh_mn/sh_span (N,) f32 | REMOVE absent
  cov3d    (6, N) f32 or f16 — precomputed R S S^T R^T uniques
"""

from __future__ import annotations

import dataclasses
import enum

import jax.numpy as jnp
import numpy as np

from ..core.covariance import cov3d_from_scale_rot
from ..core.sh import SH_C0
from .gaussian import Gaussians, sigmoid


class ShCompression(enum.Enum):
    """Ref `ShCompression` (`src/app.rs:386-404`); default NORM8."""

    SINGLE = "single"
    HALF = "half"
    NORM8 = "norm8"
    REMOVE = "remove"


class Cov3dCompression(enum.Enum):
    """Ref `Cov3dCompression` (`src/app.rs:406-418`); default HALF."""

    SINGLE = "single"
    HALF = "half"


# Per-splat byte sizes of each field in *our* device layout.
POS_FIELD_SIZE = 12
COLOR_FIELD_SIZE = 4
SH_FIELD_SIZES = {
    ShCompression.SINGLE: 45 * 4,
    ShCompression.HALF: 45 * 2,
    ShCompression.NORM8: 45 * 1 + 8,  # u8 coeffs + f32 min/span
    ShCompression.REMOVE: 0,
}
COV3D_FIELD_SIZES = {
    Cov3dCompression.SINGLE: 6 * 4,
    Cov3dCompression.HALF: 6 * 2,
}


@dataclasses.dataclass(frozen=True)
class Compressions:
    """Compression selection. Ref `Compressions` (`src/app.rs:342-384`)."""

    sh: ShCompression = ShCompression.NORM8
    cov3d: Cov3dCompression = Cov3dCompression.HALF

    def bytes_per_splat(self) -> int:
        return (
            POS_FIELD_SIZE
            + COLOR_FIELD_SIZE
            + SH_FIELD_SIZES[self.sh]
            + COV3D_FIELD_SIZES[self.cov3d]
        )

    def compressed_size(self, gaussian_count: int) -> int:
        """Total compressed byte size. Ref `Compressions::compressed_size`
        (`src/app.rs:352-384`)."""
        return gaussian_count * self.bytes_per_splat()


ALL_COMPRESSIONS = tuple(
    Compressions(sh=s, cov3d=c) for s in ShCompression for c in Cov3dCompression
)


def pack_gaussians(g: Gaussians, comp: Compressions, use_native: bool | None = None) -> dict:
    """Host-side pack: raw SoA -> compressed pod arrays (numpy).

    This is the CPU->pod compression applied on upload
    (`gaussians_buffer.update_range`, ref `src/tab/scene.rs:2076-2084`).

    When the gsnative C++ codec is built (native/gsnative.cpp) the fused
    multithreaded native path is used; `use_native=False` forces numpy.
    """
    if use_native is not False:
        from . import native as _native

        if _native.available():
            out = _native.pack_gaussians_native(g, comp)
            if out is not None:
                return out
    n = g.count
    pos = np.ascontiguousarray(g.pos.astype(np.float32).T)  # (3, N)
    rgb = np.clip(0.5 + SH_C0 * g.sh0, 0.0, 1.0)
    alpha = sigmoid(g.opacity)
    q8 = np.round(rgb * 255.0).astype(np.uint32)
    a8 = np.round(alpha * 255.0).astype(np.uint32)
    color0 = (q8[:, 0] | (q8[:, 1] << 8) | (q8[:, 2] << 16) | (a8 << 24)).astype(np.uint32)

    sh_flat = np.ascontiguousarray(g.sh_rest.reshape(n, 45).astype(np.float32).T)  # (45, N)
    out = {"pos": pos, "color0": color0}
    if comp.sh == ShCompression.SINGLE:
        out["sh"] = sh_flat
    elif comp.sh == ShCompression.HALF:
        out["sh"] = sh_flat.astype(np.float16)
    elif comp.sh == ShCompression.NORM8:
        mn = sh_flat.min(axis=0) if n else np.zeros(0, np.float32)
        mx = sh_flat.max(axis=0) if n else np.zeros(0, np.float32)
        span = np.maximum(mx - mn, 1e-12)
        q = np.round((sh_flat - mn[None, :]) / span[None, :] * 255.0).astype(np.uint8)
        out["sh"] = q
        out["sh_mn"] = mn.astype(np.float32)
        out["sh_span"] = span.astype(np.float32)
    # REMOVE: no sh field.

    scale_lin = np.exp(g.scale.astype(np.float32))
    cov6 = np.asarray(cov3d_from_scale_rot(jnp.asarray(scale_lin), jnp.asarray(g.rot)))
    cov6 = np.ascontiguousarray(cov6.T)  # (6, N)
    if comp.cov3d == Cov3dCompression.SINGLE:
        out["cov3d"] = cov6.astype(np.float32)
    else:
        out["cov3d"] = cov6.astype(np.float16)
    return out


def unpack_sh(pod: dict, comp: Compressions) -> jnp.ndarray:
    """Device-side dequantization: pod sh field -> (N, 15, 3) f32 (test/
    reference use; the fused preprocess uses `make_sh_coeff_fn` instead)."""
    n = pod["pos"].shape[1]
    if comp.sh == ShCompression.REMOVE:
        return jnp.zeros((n, 15, 3), jnp.float32)
    sh = pod["sh"]
    if comp.sh == ShCompression.NORM8:
        shf = sh.astype(jnp.float32) / 255.0 * pod["sh_span"][None, :] + pod["sh_mn"][None, :]
    else:
        shf = sh.astype(jnp.float32)
    return shf.T.reshape(n, 15, 3)


def make_sh_coeff_fn(pod: dict, comp: Compressions):
    """Per-coefficient dequantizer: (k, c) -> (N,) f32 column (flat layout;
    avoids materializing the (N, 15, 3) tensor the fused preprocess
    previously built — see core/covariance.py TPU padding note)."""
    if comp.sh == ShCompression.REMOVE:
        n = pod["pos"].shape[1]
        zero = jnp.zeros(n, jnp.float32)
        return lambda k, c: zero
    sh = pod["sh"]
    if comp.sh == ShCompression.NORM8:
        mn = pod["sh_mn"]
        scale = pod["sh_span"] * jnp.float32(1.0 / 255.0)

        def coeff(k, c):
            return sh[k * 3 + c, :].astype(jnp.int32).astype(jnp.float32) * scale + mn

        return coeff

    def coeff(k, c):
        return sh[k * 3 + c, :].astype(jnp.float32)

    return coeff


def unpack_cov3d(pod: dict) -> jnp.ndarray:
    """(6, N) pod field -> (N, 6) f32 (test/reference use)."""
    return pod["cov3d"].astype(jnp.float32).T


def cov3d_components(pod: dict) -> tuple:
    """Six (N,) f32 covariance uniques (xx, xy, xz, yy, yz, zz)."""
    c = pod["cov3d"]
    return tuple(c[i, :].astype(jnp.float32) for i in range(6))


def unpack_color0(pod: dict) -> tuple:
    """Packed u32 rgba -> (rgb (N, 3) f32, alpha (N,) f32)."""
    w = pod["color0"]
    s = jnp.float32(1.0 / 255.0)
    r = (w & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32) * s
    g = ((w >> jnp.uint32(8)) & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32) * s
    b = ((w >> jnp.uint32(16)) & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32) * s
    a = ((w >> jnp.uint32(24)) & jnp.uint32(0xFF)).astype(jnp.int32).astype(jnp.float32) * s
    return jnp.stack([r, g, b], axis=-1), a
