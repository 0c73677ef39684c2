"""Hardware A/B of compacted dup-slot enumeration (TileConfig.dup_scan).

Measures, on the chip:
  1. Headline-frame time (6M random scene, 1080p, SH3, splat mode) for
     (max_dup, dup_scan) variants — the perf side of the knob (E = N*D).
  2. Truncation error vs the effectively-exact dup=16 render on the
     2M trained-statistics scene — the quality side (same protocol as
     tests/test_image_tpu.py::test_max_dup_truncation_bound_at_bench_scale).

Run: python scripts/ab_compact.py [--quick]
"""

import argparse
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from wgpu_3dgs_viewer_app_tpu.core import CameraOrbitControl
from wgpu_3dgs_viewer_app_tpu.data import (
    Compressions,
    make_inria_like_scene,
    make_random_scene,
    pack_gaussians,
)
from wgpu_3dgs_viewer_app_tpu.ops import TileConfig, composite_tiles_pallas_v2
from wgpu_3dgs_viewer_app_tpu.ops.fused import build_sorted_entries_fused


def time_frames(step, args, iters=10, warmup=2):
    for _ in range(warmup):
        float(step(*args).ravel()[0:1].sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(*args)
    float(out.ravel()[0:1].sum())
    return (time.perf_counter() - t0) / iters


VARIANTS = [(4, 0), (4, 12), (3, 12), (3, 9), (2, 12)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="600k scene (smoke)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    n = 600_000 if args.quick else 6_000_000
    w, h = 1920, 1088
    comp = Compressions()
    scene = make_random_scene(n, seed=0, extent=2.0, scale_range=(0.004, 0.02))
    pod = {k: jnp.asarray(v) for k, v in pack_gaussians(scene, comp).items()}
    cam = CameraOrbitControl(target=(0, 0, 0), pos=(0, 0, -6))
    view = jnp.asarray(cam.view())
    proj = jnp.asarray(cam.projection(w / h))
    print(f"backend={jax.default_backend()} perf scene: {n} splats @ {w}x{h}")

    for dup, scan in VARIANTS:
        cfg = TileConfig(w, h, tile=32, max_dup=dup, dup_scan=scan)

        def step(pod, view, proj, cfg=cfg):
            ent = build_sorted_entries_fused(
                pod, comp, cfg, view, proj, jnp.eye(4),
                sh_degree=3, display_mode=0,
            )
            return composite_tiles_pallas_v2(ent, cfg)

        dt = time_frames(step, (pod, view, proj), iters=args.iters)
        print(f"dup={dup} scan={scan:2d}: {dt*1e3:7.2f} ms = {1/dt:5.1f} fps",
              flush=True)

    # --- quality: truncation error vs dup16 on the trained-like scene ---
    nq = 200_000 if args.quick else 2_000_000
    g = make_inria_like_scene(nq, seed=0, scene_scale=4.0)
    podq = {k: jnp.asarray(v) for k, v in pack_gaussians(g, comp).items()}
    camq = CameraOrbitControl(target=(0, 0, 0), pos=(0, 2.0, -9.0))
    viewq = jnp.asarray(camq.view())
    projq = jnp.asarray(camq.projection(w / h))

    def render(dup, scan):
        cfg = TileConfig(w, h, tile=32, max_dup=dup, dup_scan=scan)
        return np.asarray(composite_tiles_pallas_v2(
            build_sorted_entries_fused(podq, comp, cfg, viewq, projq,
                                       jnp.eye(4), sh_degree=1), cfg))

    img16 = render(16, 0)
    print(f"quality scene: {nq} trained-like splats @ {w}x{h} vs dup=16")
    for dup, scan in VARIANTS:
        d = np.abs(render(dup, scan) - img16)
        print(f"dup={dup} scan={scan:2d}: mean |err| = {d.mean():.2e}, "
              f"p99.9 = {np.quantile(d, 0.999):.3f}", flush=True)


if __name__ == "__main__":
    main()
