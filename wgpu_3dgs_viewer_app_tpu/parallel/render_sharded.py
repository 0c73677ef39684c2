"""Multi-chip sharded rendering over a `jax.sharding.Mesh`.

The reference is a single-GPU app (SURVEY §2.3) — multi-device scaling is a
*new* capability designed TPU-natively, not a port:

- **Splat axis = data parallel.** Pod arrays are sharded over the mesh's
  `splats` axis; the fused preprocess runs on local shards only (perfectly
  elementwise, zero communication).
- **Tile axis = output parallel.** The screen is cut into horizontal slabs of
  whole tile rows, one slab per device. After preprocess, per-splat screen
  quantities are `all_gather`ed over ICI (the only collective in the frame;
  ~44 B/splat) and each device bins + sorts + composites only its slab.
  The frame ends with each device holding its slab — the image is sharded
  over devices, matching how a sharded encoder/display pipeline would
  consume it.

This mirrors sequence-parallel style sharding of the splat axis with
tile-fragment ownership per chip (SURVEY §5 "long-context" row).
"""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.compression import Compressions
from ..ops.binning import TileConfig, build_sorted_entries
from ..ops.composite import (
    composite_tiles_jnp_v2,
    composite_tiles_pallas_v2,
    over_background,
)
from ..ops.preprocess import PreprocessOut, preprocess


def make_mesh(devices=None, axis: str = "splats") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def slab_config(cfg: TileConfig, n_devices: int) -> tuple:
    """Split the screen into `n_devices` slabs of whole tile rows.

    Returns (slab_cfg, slab_height, padded_height).
    """
    rows_total = cfg.tiles_y
    rows_per = -(-rows_total // n_devices)
    slab_h = rows_per * cfg.tile
    padded_h = slab_h * n_devices
    slab_cfg = TileConfig(cfg.width, slab_h, tile=cfg.tile, max_dup=cfg.max_dup)
    return slab_cfg, slab_h, padded_h


def _clip_to_slab(pre: PreprocessOut, y0, slab_h: int) -> PreprocessOut:
    """Shift screen y into slab-local coords and cull non-intersecting splats."""
    y = pre.mean_y - y0.astype(jnp.float32)
    intersects = (y + pre.radius > 0) & (y - pre.radius < slab_h)
    valid = pre.valid & intersects
    return dataclasses.replace(
        pre, mean_y=y, alpha=jnp.where(valid, pre.alpha, 0.0), valid=valid
    )


def _pod_spec(v, axis):
    """Rows-layout pod arrays carry the splat axis as (R, 128): shard the
    row dim (-2); the 128-lane dim stays whole on every device."""
    return P(*([None] * (v.ndim - 2)), axis, None)


def shard_pod(pod: dict, mesh: Mesh, axis: str = "splats") -> dict:
    """Place pod arrays sharded over the splat-row axis (pad rows to a
    device multiple)."""
    n_dev = mesh.shape[axis]
    out = {}
    for k, v in pod.items():
        rows = v.shape[-2]
        pad = (-rows) % n_dev
        if pad:
            pad_shape = v.shape[:-2] + (pad, v.shape[-1])
            v = jnp.concatenate([v, jnp.zeros(pad_shape, v.dtype)], axis=-2)
        out[k] = jax.device_put(v, NamedSharding(mesh, _pod_spec(v, axis)))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "axis", "comp", "cfg", "sh_degree", "display_mode", "use_pallas"),
)
def render_frame_sharded(
    pod: dict,
    mesh: Mesh,
    axis: str,
    comp: Compressions,
    cfg: TileConfig,
    view: jnp.ndarray,
    proj: jnp.ndarray,
    model: jnp.ndarray,
    background: jnp.ndarray,
    sh_degree: int = 3,
    display_mode: int = 0,
    use_pallas: bool = False,
):
    """Sharded frame -> (padded_H, W, 3); rows beyond cfg.height are blank."""
    n_dev = mesh.shape[axis]
    slab_cfg, slab_h, padded_h = slab_config(cfg, n_dev)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            {k: _pod_spec(v, axis) for k, v in pod.items()},
            P(),
            P(),
            P(),
            P(),
        ),
        out_specs=P(axis),
        check_vma=False,
    )
    def step(pod_local, view_, proj_, model_, bg_):
        # 1) data-parallel preprocess on the local splat shard.
        pre_local = preprocess(
            pod_local,
            comp,
            view_,
            proj_,
            model_,
            cfg.width,
            cfg.height,
            sh_degree=sh_degree,
            display_mode=display_mode,
        )
        # 2) all-gather per-splat screen data over ICI (concat on splat axis).
        pre_full = jax.tree.map(
            lambda x: jax.lax.all_gather(x, axis, tiled=True), pre_local
        )
        # 3) this device's slab: bin + sort + composite locally.
        did = jax.lax.axis_index(axis)
        y0 = did * slab_h
        pre_slab = _clip_to_slab(pre_full, y0, slab_h)
        entries = build_sorted_entries(pre_slab, slab_cfg, impl="pallas" if use_pallas else "jnp")
        flat = display_mode != 0
        if use_pallas:
            img = composite_tiles_pallas_v2(entries, slab_cfg, flat_mode=flat)
        else:
            img = composite_tiles_jnp_v2(entries, slab_cfg, flat_mode=flat)
        return over_background(img, bg_)

    return step(pod, view, proj, model, jnp.asarray(background, jnp.float32))


def render_sharded(
    pod: dict,
    mesh: Mesh,
    comp: Compressions,
    cfg: TileConfig,
    view,
    proj,
    model=None,
    background=(0.0, 0.0, 0.0),
    sh_degree: int = 3,
    display_mode: int = 0,
    use_pallas: bool | None = None,
    axis: str = "splats",
):
    """Convenience wrapper; returns (H, W, 3) cropped to the real viewport."""
    if model is None:
        model = jnp.eye(4)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    img = render_frame_sharded(
        pod,
        mesh,
        axis,
        comp,
        cfg,
        jnp.asarray(view),
        jnp.asarray(proj),
        jnp.asarray(model),
        jnp.asarray(background, jnp.float32),
        sh_degree=sh_degree,
        display_mode=display_mode,
        use_pallas=use_pallas,
    )
    return img[: cfg.height]
