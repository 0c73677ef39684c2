"""Tile-local front-to-back alpha compositing — the TPU replacement for the
crate's `Renderer` draw-indirect rasterization + hardware blending
(reference `src/tab/scene.rs:2306-2313`, 12-buffer contract at
`src/tab/scene.rs:1854-1867`).

Design (BASELINE.json north star: "tile-local front-to-back compositing
kernel accumulating in VMEM"):

- Screen is cut into `tile x tile` pixel tiles; binning (ops/binning.py)
  provides per-tile front-to-back splat runs.
- Per tile, splats stream through VMEM in chunks of CHUNK. For each chunk we
  build the (CHUNK, P) alpha matrix on the VPU, then recover per-splat
  transmittance with a *parallel* Hillis-Steele cumulative product along the
  splat axis (order-independent-transmittance formulation — compositing
  becomes `rgb += (T_carry * cumprod_excl(1-a) * a)^T @ colors`, a clean
  matmul/reduction instead of a serial pixel blend; cf. PAPERS.md
  "Order-independent Transmittance").
- Early exit: once every pixel in the tile is saturated
  (max transmittance < 1/255), remaining chunks are skipped — the TPU analog
  of the fragment-level early termination in GPU 3DGS.

Two implementations with identical math:
  composite_tiles_jnp    — pure jnp (vmap over tiles); runs anywhere; used on
                           CPU and as the differentiable/verifiable reference.
  composite_tiles_pallas — Pallas TPU kernel: per-tile grid, scalar-prefetched
                           tile ranges, manual HBM->VMEM chunk DMA, VMEM
                           accumulators.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import TileConfig, TileLists

ALPHA_EPS = 1.0 / 255.0
T_EPS = 1.0 / 255.0
ALPHA_MAX = 0.99
FLAT_POWER_CUTOFF = -2.0  # ellipse/point: flat fill inside 2-sigma boundary


def _chunk_alpha(geom_c, px, py, live, flat_mode: bool):
    """(CHUNK, 8) geom + pixel row vectors -> (CHUNK, P) alpha matrix."""
    mx = geom_c[:, 0:1]
    my = geom_c[:, 1:2]
    ca = geom_c[:, 2:3]
    cb = geom_c[:, 3:4]
    cc = geom_c[:, 4:5]
    op = geom_c[:, 5:6]
    dx = px - mx
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    if flat_mode:
        a = jnp.where(power >= FLAT_POWER_CUTOFF, op, 0.0)
    else:
        a = op * jnp.exp(power)
    a = jnp.minimum(a, ALPHA_MAX)
    a = jnp.where((power > 0.0) | (a < ALPHA_EPS) | ~live, 0.0, a)
    return a


def _excl_cumprod_rows(om: jnp.ndarray, chunk: int, use_roll: bool):
    """Inclusive+exclusive cumulative product along axis 0 (the splat axis).

    Hillis-Steele doubling: log2(chunk) masked-multiply steps — a parallel
    scan the VPU executes as elementwise work, instead of a serial blend.
    """
    if use_roll:
        incl = om
        row = jax.lax.broadcasted_iota(jnp.int32, om.shape, 0)
        shift = 1
        while shift < chunk:
            rolled = pltpu.roll(incl, shift, axis=0)
            rolled = jnp.where(row < shift, 1.0, rolled)
            incl = incl * rolled
            shift *= 2
        rolled = pltpu.roll(incl, 1, axis=0)
        excl = jnp.where(row < 1, 1.0, rolled)
    else:
        incl = jnp.cumprod(om, axis=0)
        excl = jnp.concatenate([jnp.ones_like(om[:1]), incl[:-1]], axis=0)
    return incl, excl


# ---------------------------------------------------------------------------
# Portable jnp implementation
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("cfg", "flat_mode", "chunk"))
def composite_tiles_jnp(
    geom: jnp.ndarray,
    color: jnp.ndarray,
    lists: TileLists,
    cfg: TileConfig,
    flat_mode: bool = False,
    chunk: int = 64,
) -> jnp.ndarray:
    """Returns (H, W, 4) f32: premultiplied rgb + coverage alpha."""
    tile = cfg.tile
    p = tile * tile
    ntx, nty = cfg.tiles_x, cfg.tiles_y

    tile_ids = jnp.arange(cfg.n_tiles, dtype=jnp.int32)
    origin_x = (tile_ids % ntx) * tile
    origin_y = (tile_ids // ntx) * tile

    lane = jnp.arange(p, dtype=jnp.int32)

    def one_tile(start, count, ox, oy):
        px = (ox + lane % tile).astype(jnp.float32)[None, :] + 0.5
        py = (oy + lane // tile).astype(jnp.float32)[None, :] + 0.5
        row = jnp.arange(chunk, dtype=jnp.int32)[:, None]

        def cond(state):
            c, t, _ = state
            return (c * chunk < count) & (jnp.max(t) > T_EPS)

        def body(state):
            c, t, rgb = state
            off = start + c * chunk
            geom_c = jax.lax.dynamic_slice(geom, (off, 0), (chunk, 8))
            color_c = jax.lax.dynamic_slice(color, (off, 0), (chunk, 4))
            live = (c * chunk + row) < count
            a = _chunk_alpha(geom_c, px, py, live, flat_mode)
            incl, excl = _excl_cumprod_rows(1.0 - a, chunk, use_roll=False)
            w = t[None, :] * excl * a  # (chunk, P)
            rgb = rgb + jnp.einsum(
                "cp,ck->pk", w, color_c[:, :3], preferred_element_type=jnp.float32
            )
            t = t * incl[-1]
            return c + 1, t, rgb

        c0 = jnp.int32(0)
        t0 = jnp.ones((p,), jnp.float32)
        rgb0 = jnp.zeros((p, 3), jnp.float32)
        _, t, rgb = jax.lax.while_loop(cond, body, (c0, t0, rgb0))
        return jnp.concatenate([rgb, (1.0 - t)[:, None]], axis=1)  # (P, 4)

    tiles = jax.vmap(one_tile)(lists.tile_starts, lists.tile_counts, origin_x, origin_y)
    img = tiles.reshape(nty, ntx, tile, tile, 4).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nty * tile, ntx * tile, 4)
    return img[: cfg.height, : cfg.width]


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------


def _composite_kernel(
    starts_ref,
    counts_ref,
    geom_hbm,
    color_hbm,
    out_ref,
    *,
    cfg: TileConfig,
    flat_mode: bool,
    chunk: int,
):
    t = pl.program_id(0)
    tile = cfg.tile
    p = tile * tile
    ntx = cfg.tiles_x
    start = starts_ref[t]
    count = counts_ref[t]
    ox = (t % ntx) * tile
    oy = (t // ntx) * tile

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, p), 1)
    px = (ox + lane % tile).astype(jnp.float32) + 0.5
    py = (oy + lane // tile).astype(jnp.float32) + 0.5
    row = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)

    def scoped(geom_buf, color_buf, t_buf, rgb_buf, sems):
        t_buf[:] = jnp.ones((1, p), jnp.float32)
        rgb_buf[:] = jnp.zeros((3, p), jnp.float32)

        def get_dma(slot, c):
            off = start + c * chunk
            return (
                pltpu.make_async_copy(
                    geom_hbm.at[pl.ds(off, chunk), :], geom_buf.at[slot], sems.at[slot, 0]
                ),
                pltpu.make_async_copy(
                    color_hbm.at[pl.ds(off, chunk), :], color_buf.at[slot], sems.at[slot, 1]
                ),
            )

        n_chunks = (count + chunk - 1) // chunk

        @pl.when(n_chunks > 0)
        def _():
            g0, c0 = get_dma(0, 0)
            g0.start()
            c0.start()

        def cond(state):
            c, _ = state
            return (c < n_chunks) & (t_buf[0, :].max() > T_EPS)

        def body(state):
            c, _ = state
            slot = jax.lax.rem(c, 2)
            nxt = jax.lax.rem(c + 1, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                gn, cn = get_dma(nxt, c + 1)
                gn.start()
                cn.start()

            g_dma, c_dma = get_dma(slot, c)
            g_dma.wait()
            c_dma.wait()

            geom_c = geom_buf[slot]
            color_c = color_buf[slot]
            live = (c * chunk + row) < count
            a = _chunk_alpha(geom_c, px, py, live, flat_mode)
            incl, excl = _excl_cumprod_rows(1.0 - a, chunk, use_roll=True)
            tcur = t_buf[0:1, :]
            w = tcur * excl * a  # (chunk, P)
            # rgb (3, P) += color^T (3, chunk) @ w (chunk, P) — MXU contraction.
            rgb_buf[:] = rgb_buf[:] + jax.lax.dot_general(
                color_c[:, :3],
                w,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            t_buf[:] = tcur * incl[chunk - 1 : chunk, :]
            return c + 1, 0

        jax.lax.while_loop(cond, body, (jnp.int32(0), 0))

        out_ref[0, 0:3, :] = rgb_buf[:]
        out_ref[0, 3:4, :] = 1.0 - t_buf[:]

    pl.run_scoped(
        scoped,
        geom_buf=pltpu.VMEM((2, chunk, 8), jnp.float32),
        color_buf=pltpu.VMEM((2, chunk, 4), jnp.float32),
        t_buf=pltpu.VMEM((1, p), jnp.float32),
        rgb_buf=pltpu.VMEM((3, p), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((2, 2)),
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "flat_mode", "chunk", "interpret")
)
def composite_tiles_pallas(
    geom: jnp.ndarray,
    color: jnp.ndarray,
    lists: TileLists,
    cfg: TileConfig,
    flat_mode: bool = False,
    chunk: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Pallas tile compositor. Returns (H, W, 4) f32."""
    tile = cfg.tile
    p = tile * tile

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(cfg.n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((1, 4, p), lambda t, *_: (t, 0, 0), memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(
        _composite_kernel, cfg=cfg, flat_mode=flat_mode, chunk=chunk
    )
    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((cfg.n_tiles, 4, p), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(lists.tile_starts, lists.tile_counts, geom, color)

    ntx, nty = cfg.tiles_x, cfg.tiles_y
    img = tiles.transpose(0, 2, 1).reshape(nty, ntx, tile, tile, 4).transpose(0, 2, 1, 3, 4)
    img = img.reshape(nty * tile, ntx * tile, 4)
    return img[: cfg.height, : cfg.width]


def composite_tiles(
    geom, color, lists, cfg: TileConfig, flat_mode: bool = False, backend: str | None = None
):
    """Backend dispatcher: Pallas on TPU, jnp elsewhere."""
    backend = backend or jax.default_backend()
    if backend == "tpu":
        return composite_tiles_pallas(geom, color, lists, cfg, flat_mode=flat_mode)
    return composite_tiles_jnp(geom, color, lists, cfg, flat_mode=flat_mode)


def over_background(img: jnp.ndarray, background: jnp.ndarray) -> jnp.ndarray:
    """Composite premultiplied (H, W, 4) over an opaque background color."""
    bg = jnp.asarray(background, jnp.float32)
    rgb = img[..., :3] + (1.0 - img[..., 3:4]) * bg
    return rgb
