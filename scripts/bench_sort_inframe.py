"""In-frame sort-interior profile on the REAL bench scene (not synthetic).

Times cumulative prefixes of the headline frame's sort stage so each
sub-stage's cost lands on its own line:

    fe            enumerate_entries_fused only
    +pad+compact  ... + _pad_to_block + compact_entries
    +block_sort   ... + phase-1 (live-masked, fused L1)
    +levels       ... + all merge levels (interleaved final)
    +ranges       ... + tile-range searchsorted (= full sort stage)

Diffs between consecutive rows = the sub-stage device cost as the frame
actually pays it (pipelined, one checksum sync at the end).
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

import jax.numpy as jnp


def _time(fn, args, iters=10, warmup=2):
    """bench.time_frames discipline: enqueue back-to-back, force completion
    once with a tiny device reduce + host transfer (block_until_ready can
    return early on this platform — PERF_NOTES.md)."""
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
    from wgpu_3dgs_viewer_app_tpu.ops.compact import compact_entries
    from wgpu_3dgs_viewer_app_tpu.ops.fused import (enumerate_entries_fused,
                                                    sort_and_range_entries)
    from wgpu_3dgs_viewer_app_tpu.ops.sort import (_pad_to_block, block_sort,
                                                   merge_sort)

    comp, pod, view, proj, cfg = build(6_000_000, 1920, 1088, 3, 0)

    def fe(pod, view, proj):
        ks, p1, p2, p3 = enumerate_entries_fused(
            pod, comp, cfg, view, proj, jnp.eye(4), sh_degree=3,
            display_mode=0)
        return ks, p1, p2, p3

    @jax.jit
    def t_fe(pod, view, proj):
        ks, p1, p2, p3 = fe(pod, view, proj)
        return (ks[::65536] ^ p1[::65536]).astype(jnp.float32)

    @jax.jit
    def t_compact(pod, view, proj):
        planes = _pad_to_block(*fe(pod, view, proj))
        out = compact_entries(*planes)
        return out[0][::65536].astype(jnp.float32) + out[4].astype(jnp.float32)

    @jax.jit
    def t_block(pod, view, proj):
        planes = _pad_to_block(*fe(pod, view, proj))
        ks, p1, p2, p3, live = compact_entries(*planes)
        out = block_sort(ks, p1, p2, p3, live_rows=live)
        return out[0][::65536].astype(jnp.float32)

    @jax.jit
    def t_sort(pod, view, proj):
        planes = _pad_to_block(*fe(pod, view, proj))
        out = merge_sort(*planes, interleaved=True, compact=True)
        return out[0][::65536].astype(jnp.float32)

    @jax.jit
    def t_ranges(pod, view, proj):
        ks, p1, p2, p3 = fe(pod, view, proj)
        ent = sort_and_range_entries(ks, p1, p2, p3, cfg)
        return ent.planes[::4096, 0, :1].astype(jnp.float32)

    args = (pod, view, proj)
    rows = [("fe", t_fe), ("+pad+compact", t_compact),
            ("+block_sort", t_block), ("+levels", t_sort),
            ("+ranges", t_ranges)]
    prev = 0.0
    for name, fn in rows:
        t = _time(fn, args)
        print(f"{name:14s} {t*1e3:7.2f} ms  (delta {((t-prev))*1e3:+6.2f})")
        prev = t


if __name__ == "__main__":
    main()
