"""Phase-level sort microbench at headline scale.

Times phase 1 (block_sort), the full merge sort, and (optionally) the
lax.sort reference on bench-shaped entry planes: E = N * max_dup entries
with a realistic sentinel fraction (sentinels = culled/empty dup slots;
~44% at the 6M@1080p bench scene). Run on the real chip:

    python scripts/bench_sort.py [--e 25165824] [--frac 0.44] [--lax]

Phases print separately so a kernel change's effect lands on the right
line without a full bench run (the headline bench adds front-end +
compositor around this).
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

import jax

# Ambient plugin shims ignore the JAX_PLATFORMS env var; mirror it through
# the config API so `JAX_PLATFORMS=cpu python scripts/bench_sort.py` works
# even when the TPU runtime is unreachable.
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

# Persistent compile cache (shared with bench.py): --levels compiles ~10
# full merge_sort variants; uncached that is most of the wall time.
jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def _time(fn, args, iters=10, warmup=2):
    for _ in range(warmup):
        float(fn(*args)[0].ravel()[0:1].sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(*args)
    float(out[0].ravel()[0:1].sum())
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--e", type=int, default=24 * 1024 * 1024)
    ap.add_argument("--frac", type=float, default=0.44)
    ap.add_argument("--lax", action="store_true", help="also time lax.sort")
    ap.add_argument("--levels", action="store_true",
                    help="per-merge-level breakdown (t(k) - t(k-1))")
    ap.add_argument("--interpret", action="store_true",
                    help="Pallas interpret mode (CPU smoke runs)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from wgpu_3dgs_viewer_app_tpu.ops.sort import (BLOCK, COMPACT,
                                                    block_sort, merge_sort)

    e = (args.e // BLOCK) * BLOCK
    rng = np.random.default_rng(0)
    k = rng.integers(0, 1 << 32, e, dtype=np.uint32)
    k[rng.random(e) < args.frac] = 0xFFFFFFFF
    p1 = np.arange(e, dtype=np.uint32)
    p2 = rng.integers(0, 1 << 32, e, dtype=np.uint32)
    p3 = rng.integers(0, 1 << 32, e, dtype=np.uint32)
    planes = tuple(jnp.asarray(a) for a in (k, p1, p2, p3))

    print(f"backend={jax.default_backend()} E={e/1e6:.1f}M "
          f"sentinels={args.frac:.0%}")

    interp = args.interpret
    bs = jax.jit(lambda *a: block_sort(*a, interpret=interp)[:4])
    t1 = _time(bs, planes, iters=args.iters)
    print(f"phase 1 (block_sort 16K tiles): {t1*1e3:7.2f} ms")

    # Module default (GS_SORT_COMPACT) so the headline rows match the
    # frame path; phase 1 above stays uncompacted for comparability.
    ms = jax.jit(lambda *a: merge_sort(*a, interpret=interp, compact=COMPACT))
    t2 = _time(ms, planes, iters=args.iters)
    print(f"merge_sort (phase 1 + levels):  {t2*1e3:7.2f} ms "
          f"(levels ~{(t2-t1)*1e3:.2f} ms)")

    msi = jax.jit(lambda *a: merge_sort(*a, interleaved=True, interpret=interp,
                                        compact=COMPACT))
    t3 = _time(msi, planes, iters=args.iters)
    print(f"merge_sort interleaved:         {t3*1e3:7.2f} ms")

    if args.levels:
        # Per-level cost by difference: t(max_levels=k) - t(max_levels=k-1).
        # Levels shrink as live compaction trims sentinel rows, so early
        # levels dominate; this attributes the merge total to each.
        import math
        nlevels = math.ceil(math.log2(max(2, e // BLOCK)))
        prev = t1
        for lv in range(1, nlevels + 1):
            fn = jax.jit(lambda *a, lv=lv: merge_sort(*a, max_levels=lv,
                                                      interpret=interp, compact=COMPACT))
            t = _time(fn, planes, iters=args.iters)
            print(f"  level {lv:2d}: {(t - prev)*1e3:7.2f} ms "
                  f"(cum {t*1e3:7.2f})")
            prev = t

    if args.lax:
        lx = jax.jit(
            lambda *a: jax.lax.sort(a, num_keys=1, is_stable=False))
        t4 = _time(lx, planes, iters=max(2, args.iters // 2))
        print(f"lax.sort reference:             {t4*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
