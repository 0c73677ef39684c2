"""On-chip probe: compositor kernel vs image-assembly tail cost.

The frame's last stage is composite_tiles_pallas_v2 = Pallas kernel
-> (T, 4, P) tiles -> transpose/reshape chain -> (H, W, 4) image. This
times the full stage and a variant stopping at the raw kernel output, so
the relayout tail gets its own number.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).resolve().parent.parent / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import functools

import jax.numpy as jnp


def _time(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        float(fn(*args).ravel()[0:1].sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out.ravel()[0:1].sum())
    return (time.perf_counter() - t0) / iters


def main():
    from bench import build
    from wgpu_3dgs_viewer_app_tpu.ops import composite_tiles_pallas_v2
    from wgpu_3dgs_viewer_app_tpu.ops.fused import (build_sorted_entries_fused,
                                                    enumerate_entries_fused,
                                                    sort_and_range_entries)

    comp, pod, view, proj, cfg = build(6_000_000, 1920, 1088, 3, 0)

    def entries_of(pod, view, proj):
        ks, p1, p2, p3 = enumerate_entries_fused(
            pod, comp, cfg, view, proj, jnp.eye(4), sh_degree=3,
            display_mode=0)
        return sort_and_range_entries(ks, p1, p2, p3, cfg)

    @jax.jit
    def t_base(pod, view, proj):
        ent = entries_of(pod, view, proj)
        return ent.planes[::4096, 0, :1].astype(jnp.float32)

    @jax.jit
    def t_full(pod, view, proj):
        ent = entries_of(pod, view, proj)
        return composite_tiles_pallas_v2(ent, cfg, flat_mode=False)

    # Kernel-only variant: replicate the wrapper up to the raw tile output.
    from wgpu_3dgs_viewer_app_tpu.ops import composite as C

    @jax.jit
    def t_kernel(pod, view, proj):
        ent = entries_of(pod, view, proj)
        tile = cfg.tile
        p = tile * tile
        grid_spec = C.pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(cfg.n_tiles,),
            in_specs=[C.pl.BlockSpec(memory_space=C.pl.ANY)],
            out_specs=C.pl.BlockSpec((1, 4, p), lambda t, *_: (t, 0, 0),
                                     memory_space=C.pltpu.VMEM),
        )
        kernel = functools.partial(C._composite_kernel_v2t, cfg=cfg,
                                   flat_mode=False, split=1)
        tiles = C.pl.pallas_call(
            kernel, grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((cfg.n_tiles, 4, p), jnp.float32),
        )(ent.tile_starts, ent.tile_counts, ent.planes)
        return tiles[::64, 0, :1]

    args = (pod, view, proj)
    tb = _time(t_base, args)
    tk = _time(t_kernel, args)
    tf = _time(t_full, args)
    print(f"fe+sort base   {tb*1e3:7.2f} ms")
    print(f"+kernel only   {tk*1e3:7.2f} ms  (kernel {1e3*(tk-tb):+5.2f})")
    print(f"+full stage    {tf*1e3:7.2f} ms  (tail   {1e3*(tf-tk):+5.2f})")


if __name__ == "__main__":
    main()
