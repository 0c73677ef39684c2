"""Fully fused Pallas render front-end: pod -> sorted packed entries.

One kernel performs, per splat block, everything the crate's WGSL
`Preprocessor` pass does on the plain render path (reference
`src/tab/scene.rs:856-863`) PLUS tile enumeration and payload packing:

    decode pod (u32-word f16/u8 fields) -> model/view transform -> EWA conic
    -> SH->RGB -> opacity-aware extent -> cull -> center-out tile cells ->
    sort keys + packed payload planes

replacing the XLA preprocess (~22 ms of fragmented small fusions at 6M
splats) and the separate enumeration kernel with a single pass over the pod
(BASELINE.md north star: "the WGSL preprocess pass becomes one fused Pallas
kernel").

Gated paths run through the SAME kernel (round-2 verdict next #6): mask
bits and selection bits ride one packed u32 plane (bit 0 = mask,
bit 1 = selected), per-splat edits ride a u32 flags plane + a (7, Rb, 128)
value block, and the scene-wide selection edit / highlight constants ride
the SMEM params vector — so the interactive editing workloads (BASELINE
configs 3/4) pay the same front-end as the plain orbit path instead of
falling back to the XLA preprocess. Only a traced `size` (display modes
reading it per-splat) still uses ops/preprocess.py + ops/binning.py.

The kernel reads the TPU row pod layout (data/compression.py) natively:
every field block is (k, Rb, 128) full tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.covariance import (
    cov2d_to_conic_radius,
    project_cov3d_to_cov2d,
    transform_cov6_t,
)
from ..core.f16 import unpack2xf16
from ..core.sh import eval_sh_rest_channels
from ..data.compression import Compressions, Cov3dCompression, ShCompression
from .binning import (
    ROW,
    SortedEntries,
    TileConfig,
    _entry_planes_all,
    _sorted_entries_from_sorted,
    _splat_rect,
    _tight_cull_params,
    depth_alpha_key_lo,
)
from .preprocess import ALPHA_EPS

ROWS_PER_BLOCK = 128  # 16k splats per grid step; 256 rows OOMs the 16 MB VMEM
# stack at norm8-SH shapes (measured 16.13 MB with double-buffered pipelining
# + ~50 live (Rb, 128) f32 temporaries)

# Index of the model rank in the packed frame-params vector. The packer
# (_frame_params) and the kernel must agree: 9 (model 3x3) + 3 (model t)
# + 9 (view 3x3) + 3 (view t) + 8 (intrinsics) + 3 (cam) + 2 (z range) = 37
# elements precede it.
MODEL_RANK_SLOT = 37
# Gated-path constants (scene-wide selection edit + highlight) follow:
# 38 = selection-edit flags, 39-41 = its rgb/hsv, 42-45 = its params
# (contrast, exposure, gamma, alpha), 46-49 = highlight rgba.
SEL_FLAGS_SLOT = 38
SEL_RGB_SLOT = 39
SEL_PARAMS_SLOT = 42
HIGHLIGHT_SLOT = 46
PARAMS_LEN = 52

# Presort (fused phase-1 block sort) VMEM budget: the in-kernel bitonic
# sort's live temporaries scale with rb*d rows x 4 planes; 512 rows
# (= the d=4 default) measures ~8 MB of scoped stack, d=16 at full rb
# OOMs the 16 MB limit (measured 31.9 MB). Cap rb so rb*d <= 512.
_PRESORT_MAX_ROWS = 512


def _presort_rb(rows_total: int, d: int) -> int:
    """Grid-step row count for the presort path (rb*d bounded for VMEM)."""
    rb = min(ROWS_PER_BLOCK, rows_total, max(_PRESORT_MAX_ROWS // d, 8))
    return rb


class _Mat:
    """Adapter so the component-form covariance helpers (which index
    `m[i, j]` on a (3, 3) array) can run on SMEM scalars inside the kernel."""

    def __init__(self, rows):
        self.rows = rows

    def __getitem__(self, ij):
        if isinstance(ij, tuple):
            i, j = ij
            return self.rows[i][j]
        return self.rows[ij]


def _u8_unit_k(w, shift):
    return ((w >> jnp.uint32(shift)) & jnp.uint32(0xFF)).astype(jnp.int32).astype(
        jnp.float32
    ) * jnp.float32(1.0 / 255.0)


def _make_coeff_fn(comp: Compressions, sh_ref, mn, scale):
    """(k, c) -> (Rb, 128) f32 SH-rest coefficient from the rows pod field."""
    if comp.sh == ShCompression.REMOVE:
        return lambda k, c: 0.0 * mn  # mn is a zeros array in this case
    if comp.sh == ShCompression.NORM8:

        def coeff(k, c):
            i = k * 3 + c
            w = sh_ref[i // 4]
            q = (w >> jnp.uint32(8 * (i % 4))) & jnp.uint32(0xFF)
            return q.astype(jnp.int32).astype(jnp.float32) * scale + mn

        return coeff
    if comp.sh == ShCompression.HALF:
        from ..core.f16 import f16_bits_to_f32

        def coeff(k, c):
            i = k * 3 + c
            w = sh_ref[i // 2]
            return f16_bits_to_f32((w >> jnp.uint32(16 * (i % 2))) & jnp.uint32(0xFFFF))

        return coeff

    def coeff(k, c):
        return sh_ref[k * 3 + c]

    return coeff


def _kernel(
    params_ref,  # (32,) f32 SMEM
    pos_ref,     # (3, Rb, 128) f32
    color0_ref,  # (Rb, 128) u32
    cov_ref,     # (6|3, Rb, 128)
    *rest,       # [sh_ref, [mn_ref, span_ref]] then outputs
    comp: Compressions,
    cfg: TileConfig,
    sh_degree: int,
    no_sh0: bool,
    display_mode: int,
    presort: bool = False,
    has_mask: bool = False,
    has_edit: bool = False,
    has_sel_edit: bool = False,
    has_highlight: bool = False,
):
    refs = list(rest)
    sh_ref = refs.pop(0) if comp.sh != ShCompression.REMOVE else None
    if comp.sh == ShCompression.NORM8:
        mn_ref = refs.pop(0)
        span_ref = refs.pop(0)
    gate_ref = refs.pop(0) if (has_mask or has_sel_edit or has_highlight) else None
    eflags_ref = refs.pop(0) if has_edit else None
    evals_ref = refs.pop(0) if has_edit else None
    keys_ref, p1_ref, p2_ref, p3_ref = refs

    p = params_ref
    m3 = _Mat(((p[0], p[1], p[2]), (p[3], p[4], p[5]), (p[6], p[7], p[8])))
    mt = (p[9], p[10], p[11])
    v3 = _Mat(((p[12], p[13], p[14]), (p[15], p[16], p[17]), (p[18], p[19], p[20])))
    vt = (p[21], p[22], p[23])
    fx, fy, tanx, tany = p[24], p[25], p[26], p[27]
    width, height = p[28], p[29]
    size2 = p[30]
    size = p[31]
    cam = (p[32], p[33], p[34])
    z_near, z_far = p[35], p[36]

    px_, py_, pz_ = pos_ref[0], pos_ref[1], pos_ref[2]  # (Rb, 128)

    # --- decode color0 / cov3d ---
    c0 = color0_ref[...]
    c0r = (_u8_unit_k(c0, 0), _u8_unit_k(c0, 8), _u8_unit_k(c0, 16))
    alpha = _u8_unit_k(c0, 24)
    if comp.cov3d == Cov3dCompression.SINGLE:
        cov6c = tuple(cov_ref[i] for i in range(6))
    else:
        parts = []
        for j in range(3):
            lo, hi = unpack2xf16(cov_ref[j])
            parts += [lo, hi]
        cov6c = tuple(parts)

    # --- model transform ---
    def affine(m, t, x, y, z):
        return (
            m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + t[0],
            m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + t[1],
            m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + t[2],
        )

    wx, wy, wz = affine(m3, mt, px_, py_, pz_)
    cov6_w = tuple(c * size2 for c in transform_cov6_t(cov6c, m3))

    # --- view transform + projection ---
    tvx, tvy, tvz = affine(v3, vt, wx, wy, wz)
    depth = -tvz
    d = jnp.maximum(depth, 1e-6)
    sx = (fx * 2.0) / width   # proj[0,0]
    sy = (fy * 2.0) / height  # proj[1,1]
    px = (sx * tvx / d * 0.5 + 0.5) * width
    py = (0.5 - sy * tvy / d * 0.5) * height

    cov2d = project_cov3d_to_cov2d(
        cov6_w, (tvx, tvy, tvz), v3, (fx, fy), (tanx, tany)
    )
    (ca, cb, cc), radius, det_ok = cov2d_to_conic_radius(cov2d)
    if display_mode == 2:
        r_pt = jnp.maximum(2.0 * size, 1.0)
        radius = jnp.broadcast_to(r_pt, px.shape)
        inv = 4.0 / (r_pt * r_pt)
        ca = jnp.broadcast_to(inv, px.shape)
        cb = jnp.zeros_like(px)
        cc = ca

    # --- SH -> RGB ---
    if sh_degree >= 1 and comp.sh != ShCompression.REMOVE:
        dx = wx - cam[0]
        dy = wy - cam[1]
        dz = wz - cam[2]
        inv_n = jax.lax.rsqrt(jnp.maximum(dx * dx + dy * dy + dz * dz, 1e-18))
        if comp.sh == ShCompression.NORM8:
            coeff = _make_coeff_fn(
                comp, sh_ref, mn_ref[...], span_ref[...] * jnp.float32(1.0 / 255.0)
            )
        else:
            coeff = _make_coeff_fn(comp, sh_ref, None, None)
        dr, dg, db_ = eval_sh_rest_channels(
            coeff, dx * inv_n, dy * inv_n, dz * inv_n, sh_degree
        )
        base = c0r if not no_sh0 else (0.5, 0.5, 0.5)
        col = (dr + base[0], dg + base[1], db_ + base[2])
    else:
        col = c0r if not no_sh0 else tuple(jnp.full_like(c, 0.5) for c in c0r)
    col_r, col_g, col_b = (jnp.clip(c, 0.0, 1.0) for c in col)

    # --- gates + edits (ops/preprocess.py order: mask gate, per-splat
    # edit, selection edit, highlight — BEFORE the opacity-aware extent so
    # edited alpha shapes the live radius and the sort key) ---
    from ..core.edit import apply_edit_components

    gate_w = gate_ref[...] if gate_ref is not None else None
    valid_gate = None
    if has_edit:
        col_r, col_g, col_b, alpha, hidden = apply_edit_components(
            col_r, col_g, col_b, alpha, eflags_ref[...],
            evals_ref[0], evals_ref[1], evals_ref[2],
            evals_ref[3], evals_ref[4], evals_ref[5], evals_ref[6],
        )
        valid_gate = ~hidden
    if has_sel_edit or has_highlight:
        sel = ((gate_w >> jnp.uint32(1)) & jnp.uint32(1)) != 0
    if has_sel_edit:
        sflags = p[SEL_FLAGS_SLOT].astype(jnp.int32).astype(jnp.uint32)
        nf = jnp.where(sel, sflags, jnp.uint32(0))
        col_r, col_g, col_b, alpha, hidden2 = apply_edit_components(
            col_r, col_g, col_b, alpha, nf,
            p[SEL_RGB_SLOT], p[SEL_RGB_SLOT + 1], p[SEL_RGB_SLOT + 2],
            p[SEL_PARAMS_SLOT], p[SEL_PARAMS_SLOT + 1],
            p[SEL_PARAMS_SLOT + 2], p[SEL_PARAMS_SLOT + 3],
        )
        valid_gate = (~hidden2) if valid_gate is None else (valid_gate & ~hidden2)
    if has_highlight:
        ha = p[HIGHLIGHT_SLOT + 3]
        keep = 1.0 - ha
        col_r = jnp.where(sel, col_r * keep + p[HIGHLIGHT_SLOT] * ha, col_r)
        col_g = jnp.where(sel, col_g * keep + p[HIGHLIGHT_SLOT + 1] * ha, col_g)
        col_b = jnp.where(sel, col_b * keep + p[HIGHLIGHT_SLOT + 2] * ha, col_b)
    if has_mask:
        m = (gate_w & jnp.uint32(1)) != 0
        valid_gate = m if valid_gate is None else (valid_gate & m)

    # --- opacity-aware extent (ops/preprocess.py semantics) ---
    if display_mode == 0:
        cut = jnp.sqrt(2.0 * jnp.maximum(jnp.log(alpha * (1.0 / ALPHA_EPS)), 0.0))
        radius = radius * (cut * (1.0 / 3.0))
    elif display_mode == 1:
        radius = radius * (2.0 / 3.0)

    on_screen = (
        (px + radius > 0) & (px - radius < width) & (py + radius > 0) & (py - radius < height)
    )
    valid = (
        det_ok
        & (depth > z_near)
        & (depth < z_far)
        & on_screen
        & (alpha > ALPHA_EPS)
        & (radius > 0)
    )
    if valid_gate is not None:
        valid = valid & valid_gate

    # --- enumeration precursors (ops/binning.py semantics) ---
    if cfg.model_bits:
        rank = params_ref[MODEL_RANK_SLOT].astype(jnp.int32).astype(jnp.uint32)
        key_lo = depth_alpha_key_lo(depth, alpha, cfg, rank)
    else:
        key_lo = depth_alpha_key_lo(depth, alpha, cfg)
    r8 = jnp.clip(col_r * 255.0 + 0.5, 0, 255).astype(jnp.int32).astype(jnp.uint32)
    g8 = jnp.clip(col_g * 255.0 + 0.5, 0, 255).astype(jnp.int32).astype(jnp.uint32)
    b8 = jnp.clip(col_b * 255.0 + 0.5, 0, 255).astype(jnp.int32).astype(jnp.uint32)
    p1_base = b8 << jnp.uint32(24)
    from ..core.f16 import f32_to_f16_bits, pack2xf16

    p2s = pack2xf16(ca, cb)
    p3s = f32_to_f16_bits(cc) | (r8 << jnp.uint32(16)) | (g8 << jnp.uint32(24))
    # Tight-cull params derive from the PACKED planes (f16-rounded conic) so
    # the fused path culls identically to the jnp/Pallas enum paths.
    r_signed = jnp.where(valid, radius, -1.0)
    cull, rx, ry = _tight_cull_params(r_signed, p2s, p3s)

    tx0, rw, ty0, rh, n_touched = _splat_rect(px, py, rx, ry, cfg)
    if not presort:
        planes = _entry_planes_all(
            px, py, cull, key_lo, p1_base, tx0, rw, ty0, rh, n_touched, cfg
        )
        for dcell, (key_d, p1_d) in enumerate(planes):
            keys_ref[:, dcell, :] = key_d
            p1_ref[:, dcell, :] = p1_d
            p2_ref[:, dcell, :] = p2s
            p3_ref[:, dcell, :] = p3s
        return

    # Fused phase-1 block sort (PERF_NOTES "fuse phase-1 into the enum
    # kernel"): sort the step's Rb*D entry rows in VMEM before writing,
    # saving one full HBM round trip of the unsorted planes. Entry order
    # within the step is free (the sort destroys it), so the d-planes just
    # concatenate along rows. Blocks alternate asc/desc by step-local
    # parity, which equals global parity because each step holds an even
    # block count (asserted by the caller).
    from .sort import (
        LANES as SORT_LANES,
        BLOCK_ROWS as SORT_BLOCK_ROWS,
        _block_sort_body,
        _from_ord,
        _to_ord,
    )

    planes = _entry_planes_all(
        px, py, cull, key_lo, p1_base, tx0, rw, ty0, rh, n_touched, cfg
    )
    kparts = [k for k, _ in planes]
    p1parts = [p for _, p in planes]
    rows = px.shape[0] * cfg.max_dup
    ops = [
        _to_ord(jnp.concatenate(kparts, axis=0)),
        jnp.concatenate(p1parts, axis=0),
        jnp.concatenate([p2s] * cfg.max_dup, axis=0),
        jnp.concatenate([p3s] * cfg.max_dup, axis=0),
    ]
    # Same layout condition as the standalone _block_sort_kernel
    # (sort.py): mixed whenever the block is a whole number of 128-row
    # subtiles (advisor r3: the two sites had drifted apart).
    layout = "mixed" if SORT_BLOCK_ROWS % SORT_LANES == 0 else "row"
    ops = _block_sort_body(ops, rows, SORT_BLOCK_ROWS, layout=layout)
    keys_ref[...] = _from_ord(ops[0])
    p1_ref[...], p2_ref[...], p3_ref[...] = ops[1:]


def _frame_params(view, proj, model, width, height, size, model_rank=0,
                  selection_edit=None, highlight_rgba=None):
    """Pack the per-frame scalars the kernel needs into one (PARAMS_LEN,)
    f32. Slot MODEL_RANK_SLOT carries the model rank for fused multi-model
    keys; SEL_FLAGS/RGB/PARAMS and HIGHLIGHT slots carry the scene-wide
    selection edit + highlight constants for the gated paths."""
    view = jnp.asarray(view, jnp.float32)
    proj = jnp.asarray(proj, jnp.float32)
    model = jnp.asarray(model, jnp.float32)
    size = jnp.asarray(size, jnp.float32)
    m3 = model[:3, :3].reshape(-1)
    v3 = view[:3, :3].reshape(-1)
    r = view[:3, :3]
    cam = -r.T @ view[:3, 3]
    fx = 0.5 * width * proj[0, 0]
    fy = 0.5 * height * proj[1, 1]
    parts = [
        m3,
        model[:3, 3],
        v3,
        view[:3, 3],
        jnp.stack(
            [
                fx,
                fy,
                1.0 / proj[0, 0],
                1.0 / proj[1, 1],
                jnp.float32(width),
                jnp.float32(height),
                size * size,
                size,
            ]
        ),
        cam,
        jnp.asarray([0.1, 1e4], jnp.float32),  # z_near/z_far defaults
        jnp.reshape(jnp.asarray(model_rank, jnp.float32), (1,)),
    ]
    if selection_edit is not None:
        s_flags, s_rgb, s_params = selection_edit
        parts += [
            jnp.reshape(jnp.asarray(s_flags, jnp.float32), (1,)),
            jnp.asarray(s_rgb, jnp.float32).reshape(3),
            jnp.asarray(s_params, jnp.float32).reshape(4),
        ]
    else:
        parts.append(jnp.zeros(8, jnp.float32))
    if highlight_rgba is not None:
        parts.append(jnp.asarray(highlight_rgba, jnp.float32).reshape(4))
    else:
        parts.append(jnp.zeros(4, jnp.float32))
    out = jnp.concatenate(parts)
    assert out.shape[0] == HIGHLIGHT_SLOT + 4, out.shape
    return jnp.concatenate(
        [out, jnp.zeros(PARAMS_LEN - out.shape[0], jnp.float32)]
    )


@functools.partial(
    jax.jit,
    static_argnames=("comp", "cfg", "sh_degree", "no_sh0", "display_mode",
                     "interpret", "presort"),
)
def enumerate_entries_fused(
    pod: dict,
    comp: Compressions,
    cfg: TileConfig,
    view: jnp.ndarray,
    proj: jnp.ndarray,
    model: jnp.ndarray,
    sh_degree: int = 3,
    no_sh0: bool = False,
    size=1.0,
    display_mode: int = 0,
    interpret: bool = False,
    model_rank=0,
    presort: bool = False,
    mask_bits=None,
    edit=None,
    selection_bits=None,
    selection_edit=None,
    highlight_rgba=None,
):
    """pod -> flat (keys, p1, p2, p3) entry planes (one fused Pallas pass).
    `model_rank` keys the fused multi-model pass (requires
    cfg.model_bits > 0; nearest model = rank 0).

    Gating inputs mirror ops/preprocess.py: `mask_bits`/`selection_bits`
    (N,) u8/bool, `edit` per-splat (flags (N,), rgb (N,3), params (N,4)),
    `selection_edit` scene-wide (flags, rgb (3,), params (4,)),
    `highlight_rgba` (4,). Bits pack into ONE u32 plane (bit 0 mask,
    bit 1 selected); the scene-wide constants ride the SMEM params vector.

    With `presort`, each grid step's Rb*D entry rows come out block-sorted
    in the merge sort's phase-1 layout (BLOCK-entry runs alternating
    asc/desc) — feed them straight to `ops.sort.merge_presorted`, skipping
    the standalone phase-1 kernel and its HBM round trip."""
    has_mask = mask_bits is not None
    has_edit = edit is not None
    has_sel_edit = selection_bits is not None and selection_edit is not None
    has_highlight = selection_bits is not None and highlight_rgba is not None
    params = _frame_params(view, proj, model, cfg.width, cfg.height, size,
                           model_rank,
                           selection_edit if has_sel_edit else None,
                           highlight_rgba if has_highlight else None)

    pos = pod["pos"]
    rows_total = pos.shape[-2]
    gated = has_mask or has_edit or has_sel_edit or has_highlight
    # Non-presort footprint scales with rb*d (4 output planes double-buffered
    # + d dup-plane temporaries at the concat): rb=128 at d=16 measures
    # 16.05 MB scoped — 52 KB over the limit. Cap rb*d <= 1024 (d<=8, the
    # bench and interactive defaults, keep the full 128 rows). Gating adds
    # up to 9 double-buffered input planes (~1.15 MB at rb=128) plus the
    # edit math's live temporaries — halve the cap for headroom (the
    # 1024-row budget was measured WITHOUT those blocks).
    cap = 512 if gated else 1024
    rb = _presort_rb(rows_total, cfg.max_dup) if presort else min(
        ROWS_PER_BLOCK, rows_total, max(cap // cfg.max_dup, 8)
    )
    pad_rows = (-rows_total) % rb

    def padr(a):
        if pad_rows:
            shape = a.shape[:-2] + (pad_rows, a.shape[-1])
            a = jnp.concatenate([a, jnp.zeros(shape, a.dtype)], axis=-2)
        return a

    ins = [padr(pod["pos"]), padr(pod["color0"]), padr(pod["cov3d"])]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((3, rb, ROW), lambda i: (0, i, 0)),
        pl.BlockSpec((rb, ROW), lambda i: (i, 0)),
        pl.BlockSpec((pod["cov3d"].shape[0], rb, ROW), lambda i: (0, i, 0)),
    ]
    if comp.sh != ShCompression.REMOVE:
        ins.append(padr(pod["sh"]))
        in_specs.append(pl.BlockSpec((pod["sh"].shape[0], rb, ROW), lambda i: (0, i, 0)))
    if comp.sh == ShCompression.NORM8:
        ins += [padr(pod["sh_mn"]), padr(pod["sh_span"])]
        in_specs += [pl.BlockSpec((rb, ROW), lambda i: (i, 0))] * 2

    def bits_to_rows(bits, fill):
        """(N,) bits -> (rows_total, 128) u32, padded with `fill`."""
        flat = jnp.asarray(bits).reshape(-1).astype(jnp.uint32)
        need = rows_total * ROW
        if flat.shape[0] < need:
            flat = jnp.concatenate(
                [flat, jnp.full(need - flat.shape[0], fill, jnp.uint32)]
            )
        return flat[:need].reshape(rows_total, ROW)

    if has_mask or has_sel_edit or has_highlight:
        # Padding fills: mask pad = 1 and selection pad = 0 are both
        # no-ops (pod pad rows are alpha-0/invalid anyway).
        gate = bits_to_rows(mask_bits, 1) if has_mask else None
        if has_sel_edit or has_highlight:
            selp = bits_to_rows(selection_bits, 0) << jnp.uint32(1)
            gate = selp if gate is None else (gate | selp)
        ins.append(padr(gate))
        in_specs.append(pl.BlockSpec((rb, ROW), lambda i: (i, 0)))
    if has_edit:
        e_flags, e_rgb, e_params = edit

        def vals_to_rows(v):
            """(N, k) -> (k, rows_total, 128) f32 (identity-padded rows)."""
            v = jnp.asarray(v, jnp.float32)
            need = rows_total * ROW
            if v.shape[0] < need:
                v = jnp.concatenate(
                    [v, jnp.zeros((need - v.shape[0], v.shape[1]), jnp.float32)]
                )
            return v[:need].T.reshape(v.shape[1], rows_total, ROW)

        ins.append(padr(bits_to_rows(e_flags, 0)))
        in_specs.append(pl.BlockSpec((rb, ROW), lambda i: (i, 0)))
        evals = jnp.concatenate([vals_to_rows(e_rgb), vals_to_rows(e_params)])
        ins.append(padr(evals))
        in_specs.append(pl.BlockSpec((7, rb, ROW), lambda i: (0, i, 0)))

    rows_padded = rows_total + pad_rows
    d = cfg.max_dup
    if presort:
        from .sort import BLOCK_ROWS as SORT_BLOCK_ROWS

        # Step-local block parity must equal global parity: each step needs
        # an even count of whole sort blocks.
        nb_step = (rb * d) // SORT_BLOCK_ROWS
        assert (rb * d) % SORT_BLOCK_ROWS == 0 and nb_step % 2 == 0, (rb, d)
        out_spec = pl.BlockSpec((rb * d, ROW), lambda i: (i, 0))
        out_shape = jax.ShapeDtypeStruct((rows_padded * d, ROW), jnp.uint32)
    else:
        out_spec = pl.BlockSpec((rb, d, ROW), lambda i: (i, 0, 0))
        out_shape = jax.ShapeDtypeStruct((rows_padded, d, ROW), jnp.uint32)

    kernel = functools.partial(
        _kernel,
        comp=comp,
        cfg=cfg,
        sh_degree=sh_degree,
        no_sh0=no_sh0,
        display_mode=display_mode,
        presort=presort,
        has_mask=has_mask,
        has_edit=has_edit,
        has_sel_edit=has_sel_edit,
        has_highlight=has_highlight,
    )
    keys, p1, p2, p3 = pl.pallas_call(
        kernel,
        grid=(rows_padded // rb,),
        in_specs=in_specs,
        out_specs=[out_spec] * 4,
        out_shape=[out_shape] * 4,
        interpret=interpret,
    )(params, *ins)
    return (keys.reshape(-1), p1.reshape(-1), p2.reshape(-1), p3.reshape(-1))


def sort_and_range_entries(keys, p1, p2, p3, cfg: TileConfig) -> SortedEntries:
    """Shared sort + per-tile-range tail over flat entry planes."""
    from .sort import sort_entries_interleaved

    sk, inter, s1, s2, s3 = sort_entries_interleaved(keys, p1, p2, p3)
    if inter is not None:
        from .binning import _sorted_entries_from_interleaved

        return _sorted_entries_from_interleaved(sk, inter, cfg)
    return _sorted_entries_from_sorted(sk, s1, s2, s3, cfg)


@functools.partial(
    jax.jit,
    static_argnames=("comp", "cfg", "sh_degree", "no_sh0", "display_mode",
                     "interpret", "presort"),
)
def build_sorted_entries_fused(
    pod: dict,
    comp: Compressions,
    cfg: TileConfig,
    view: jnp.ndarray,
    proj: jnp.ndarray,
    model: jnp.ndarray,
    sh_degree: int = 3,
    no_sh0: bool = False,
    size=1.0,
    display_mode: int = 0,
    interpret: bool = False,
    presort: bool | None = None,
    mask_bits=None,
    edit=None,
    selection_bits=None,
    selection_edit=None,
    highlight_rgba=None,
) -> SortedEntries:
    """pod -> SortedEntries via the fused kernel + Pallas merge sort.
    Gating inputs (mask/edit/selection/highlight) as in
    `enumerate_entries_fused` — the editing workloads share this kernel.

    On the TPU at sort-worthy sizes the kernel also runs the merge sort's
    phase-1 block sort in VMEM (`presort=True`) so the unsorted entry
    planes never round-trip through HBM; the merge phase consumes the
    block-sorted planes directly."""
    import jax as _jax

    from .binning import ROW as _ROW
    from .sort import BLOCK, BLOCK_ROWS as SORT_BLOCK_ROWS, merge_presorted

    rows_total = pod["pos"].shape[-2]
    d = cfg.max_dup
    rb = _presort_rb(rows_total, d)
    rows_padded = rows_total + ((-rows_total) % rb)
    e = rows_padded * d * _ROW
    gated = any(x is not None for x in
                (mask_bits, edit, selection_bits, highlight_rgba))
    presort_ok = (
        not interpret
        and not gated  # presort VMEM budget was measured without the gating
        # input blocks (+~1.15 MB double-buffered at rb=128) — keep the
        # in-enum sort to the plain path until re-measured.
        and _jax.default_backend() == "tpu"
        and e >= 1_000_000
        and e % BLOCK == 0
        # Each grid step must emit an EVEN count of whole sort blocks —
        # the same condition enumerate_entries_fused asserts. Gate on the
        # live BLOCK_ROWS, not a hardcoded 128 (advisor r3: with
        # GS_SORT_BLOCK_ROWS=256 and max_dup=2 the old 128-based gate
        # passed while the assert fired at trace time).
        and (rb * d) % (2 * SORT_BLOCK_ROWS) == 0
    )
    # Default OFF since the lane-major block sort: the standalone phase-1
    # kernel now runs small strides on sublane rolls (30.8 -> 17.5 ms at
    # 24M), while the in-enum presort still pays the VMEM-pressure price
    # (rb capped at 128 vs 256 rows) — measured 94.7 vs 89.9 ms headline.
    # The flag remains for geometries where the separate pass loses.
    presort = False if presort is None else (presort and presort_ok)
    keys, p1, p2, p3 = enumerate_entries_fused(
        pod, comp, cfg, view, proj, model, sh_degree, no_sh0, size,
        display_mode, interpret, presort=presort,
        mask_bits=mask_bits, edit=edit, selection_bits=selection_bits,
        selection_edit=selection_edit, highlight_rgba=highlight_rgba,
    )
    if presort:
        out = merge_presorted(keys, p1, p2, p3, interleaved=True)
        if len(out) == 2:
            from .binning import _sorted_entries_from_interleaved

            return _sorted_entries_from_interleaved(out[0], out[1], cfg)
        return _sorted_entries_from_sorted(*out, cfg)
    return sort_and_range_entries(keys, p1, p2, p3, cfg)


# ---------------------------------------------------------------------------
# Fused geometry pass: the QUERY preprocess (degree 0) as one Pallas kernel.
#
# Selection/hit queries consume per-splat geometry only (screen means,
# conic, alpha, depth, radius, validity — query/selection.py, query/hit.py)
# through `app/state._preprocess_selected`, which previously paid the
# fragmented XLA preprocess every gesture frame (BASELINE config 3's first
# pass). This kernel mirrors ops/preprocess.py's degree-0 semantics exactly
# (equality-tested) with the same decode/transform/conic front section as
# `_kernel` above and the same mask/per-splat-edit gating.
# ---------------------------------------------------------------------------


def _geometry_kernel(
    params_ref,
    pos_ref,
    color0_ref,
    cov_ref,
    *rest,
    comp: Compressions,
    display_mode: int,
    has_mask: bool,
    has_edit: bool,
):
    refs = list(rest)
    gate_ref = refs.pop(0) if has_mask else None
    eflags_ref = refs.pop(0) if has_edit else None
    evals_ref = refs.pop(0) if has_edit else None
    (px_ref, py_ref, ca_ref, cb_ref, cc_ref, cr_ref, cg_ref, cbl_ref,
     al_ref, de_ref, ra_ref, va_ref) = refs

    p = params_ref
    m3 = _Mat(((p[0], p[1], p[2]), (p[3], p[4], p[5]), (p[6], p[7], p[8])))
    mt = (p[9], p[10], p[11])
    v3 = _Mat(((p[12], p[13], p[14]), (p[15], p[16], p[17]), (p[18], p[19], p[20])))
    vt = (p[21], p[22], p[23])
    fx, fy, tanx, tany = p[24], p[25], p[26], p[27]
    width, height = p[28], p[29]
    size2 = p[30]
    size = p[31]
    z_near, z_far = p[35], p[36]

    px_, py_, pz_ = pos_ref[0], pos_ref[1], pos_ref[2]
    c0 = color0_ref[...]
    c0r = (_u8_unit_k(c0, 0), _u8_unit_k(c0, 8), _u8_unit_k(c0, 16))
    alpha = _u8_unit_k(c0, 24)
    if comp.cov3d == Cov3dCompression.SINGLE:
        cov6c = tuple(cov_ref[i] for i in range(6))
    else:
        parts = []
        for j in range(3):
            lo, hi = unpack2xf16(cov_ref[j])
            parts += [lo, hi]
        cov6c = tuple(parts)

    def affine(m, t, x, y, z):
        return (
            m[0, 0] * x + m[0, 1] * y + m[0, 2] * z + t[0],
            m[1, 0] * x + m[1, 1] * y + m[1, 2] * z + t[1],
            m[2, 0] * x + m[2, 1] * y + m[2, 2] * z + t[2],
        )

    wx, wy, wz = affine(m3, mt, px_, py_, pz_)
    cov6_w = tuple(c * size2 for c in transform_cov6_t(cov6c, m3))
    tvx, tvy, tvz = affine(v3, vt, wx, wy, wz)
    depth = -tvz
    d = jnp.maximum(depth, 1e-6)
    sx = (fx * 2.0) / width
    sy = (fy * 2.0) / height
    px = (sx * tvx / d * 0.5 + 0.5) * width
    py = (0.5 - sy * tvy / d * 0.5) * height
    cov2d = project_cov3d_to_cov2d(
        cov6_w, (tvx, tvy, tvz), v3, (fx, fy), (tanx, tany)
    )
    (ca, cb, cc), radius, det_ok = cov2d_to_conic_radius(cov2d)
    if display_mode == 2:
        r_pt = jnp.maximum(2.0 * size, 1.0)
        radius = jnp.broadcast_to(r_pt, px.shape)
        inv = 4.0 / (r_pt * r_pt)
        ca = jnp.broadcast_to(inv, px.shape)
        cb = jnp.zeros_like(px)
        cc = ca

    # Degree 0: colors are the u8 base (queries never read them; kept for
    # PreprocessOut parity).
    col_r, col_g, col_b = (jnp.clip(c, 0.0, 1.0) for c in c0r)

    from ..core.edit import apply_edit_components

    valid_gate = None
    if has_edit:
        col_r, col_g, col_b, alpha, hidden = apply_edit_components(
            col_r, col_g, col_b, alpha, eflags_ref[...],
            evals_ref[0], evals_ref[1], evals_ref[2],
            evals_ref[3], evals_ref[4], evals_ref[5], evals_ref[6],
        )
        valid_gate = ~hidden
    if has_mask:
        m = (gate_ref[...] & jnp.uint32(1)) != 0
        valid_gate = m if valid_gate is None else (valid_gate & m)

    if display_mode == 0:
        cut = jnp.sqrt(2.0 * jnp.maximum(jnp.log(alpha * (1.0 / ALPHA_EPS)), 0.0))
        radius = radius * (cut * (1.0 / 3.0))
    elif display_mode == 1:
        radius = radius * (2.0 / 3.0)
    on_screen = (
        (px + radius > 0) & (px - radius < width)
        & (py + radius > 0) & (py - radius < height)
    )
    valid = (
        det_ok
        & (depth > z_near)
        & (depth < z_far)
        & on_screen
        & (alpha > ALPHA_EPS)
        & (radius > 0)
    )
    if valid_gate is not None:
        valid = valid & valid_gate

    px_ref[...] = px
    py_ref[...] = py
    ca_ref[...] = ca
    cb_ref[...] = cb
    cc_ref[...] = cc
    cr_ref[...] = col_r
    cg_ref[...] = col_g
    cbl_ref[...] = col_b
    al_ref[...] = jnp.where(valid, alpha, 0.0)
    de_ref[...] = depth
    ra_ref[...] = radius
    va_ref[...] = valid.astype(jnp.uint32)


@functools.partial(
    jax.jit,
    static_argnames=("comp", "width", "height", "display_mode", "interpret"),
)
def preprocess_geometry_fused(
    pod: dict,
    comp: Compressions,
    view: jnp.ndarray,
    proj: jnp.ndarray,
    model: jnp.ndarray,
    width: int,
    height: int,
    size=1.0,
    display_mode: int = 0,
    mask_bits=None,
    edit=None,
    interpret: bool = False,
):
    """Degree-0 per-splat geometry pass -> PreprocessOut (one Pallas kernel;
    the query path's replacement for ops/preprocess.py — identical
    semantics, equality-tested in tests/test_pipeline.py)."""
    from .preprocess import PreprocessOut

    has_mask = mask_bits is not None
    has_edit = edit is not None
    params = _frame_params(view, proj, model, width, height, size)

    pos = pod["pos"]
    rows_total = pos.shape[-2]
    rb = min(ROWS_PER_BLOCK, rows_total)
    pad_rows = (-rows_total) % rb

    def padr(a):
        if pad_rows:
            shape = a.shape[:-2] + (pad_rows, a.shape[-1])
            a = jnp.concatenate([a, jnp.zeros(shape, a.dtype)], axis=-2)
        return a

    ins = [padr(pod["pos"]), padr(pod["color0"]), padr(pod["cov3d"])]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((3, rb, ROW), lambda i: (0, i, 0)),
        pl.BlockSpec((rb, ROW), lambda i: (i, 0)),
        pl.BlockSpec((pod["cov3d"].shape[0], rb, ROW), lambda i: (0, i, 0)),
    ]

    def bits_to_rows(bits, fill):
        flat = jnp.asarray(bits).reshape(-1).astype(jnp.uint32)
        need = rows_total * ROW
        if flat.shape[0] < need:
            flat = jnp.concatenate(
                [flat, jnp.full(need - flat.shape[0], fill, jnp.uint32)]
            )
        return flat[:need].reshape(rows_total, ROW)

    if has_mask:
        ins.append(padr(bits_to_rows(mask_bits, 1)))
        in_specs.append(pl.BlockSpec((rb, ROW), lambda i: (i, 0)))
    if has_edit:
        e_flags, e_rgb, e_params = edit

        def vals_to_rows(v):
            v = jnp.asarray(v, jnp.float32)
            need = rows_total * ROW
            if v.shape[0] < need:
                v = jnp.concatenate(
                    [v, jnp.zeros((need - v.shape[0], v.shape[1]), jnp.float32)]
                )
            return v[:need].T.reshape(v.shape[1], rows_total, ROW)

        ins.append(padr(bits_to_rows(e_flags, 0)))
        in_specs.append(pl.BlockSpec((rb, ROW), lambda i: (i, 0)))
        evals = jnp.concatenate([vals_to_rows(e_rgb), vals_to_rows(e_params)])
        ins.append(padr(evals))
        in_specs.append(pl.BlockSpec((7, rb, ROW), lambda i: (0, i, 0)))

    rows_padded = rows_total + pad_rows
    out_spec = pl.BlockSpec((rb, ROW), lambda i: (i, 0))
    f32 = jax.ShapeDtypeStruct((rows_padded, ROW), jnp.float32)
    u32 = jax.ShapeDtypeStruct((rows_padded, ROW), jnp.uint32)
    outs = pl.pallas_call(
        functools.partial(
            _geometry_kernel, comp=comp, display_mode=display_mode,
            has_mask=has_mask, has_edit=has_edit,
        ),
        grid=(rows_padded // rb,),
        in_specs=in_specs,
        out_specs=[out_spec] * 12,
        out_shape=[f32] * 11 + [u32],
        interpret=interpret,
    )(params, *ins)
    flat = [o[:rows_total].reshape(-1) for o in outs]
    return PreprocessOut(
        mean_x=flat[0], mean_y=flat[1],
        conic_a=flat[2], conic_b=flat[3], conic_c=flat[4],
        col_r=flat[5], col_g=flat[6], col_b=flat[7],
        alpha=flat[8], depth=flat[9], radius=flat[10],
        valid=flat[11].astype(jnp.bool_),
    )
