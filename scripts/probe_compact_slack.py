"""On-chip probe: in-frame compaction slack at the headline bench scene.

Reports E (enumerated slots), true live entries (non-sentinel keys), the
compacted live prefix (live_rows * 128), and the slack ratio — the direct
multiplier on phase-1 + merge-level work. Synthetic uniform sentinels
(scripts/bench_sort.py --frac) measured ~7.6% slack; the real scene's
sentinel pattern is splat-clustered, so its per-column max can be worse.
"""

import sys
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
import numpy as np


def main():
    from bench import build
    from wgpu_3dgs_viewer_app_tpu.ops.fused import enumerate_entries_fused
    from wgpu_3dgs_viewer_app_tpu.ops.compact import (CROWS, LANES,
                                                      plan_compact)

    comp, pod, view, proj, cfg = build(6_000_000, 1920, 1088, 3, 0)
    ks, p1, p2, p3 = enumerate_entries_fused(
        pod, comp, cfg, view, proj, jnp.eye(4), sh_degree=3, display_mode=0)
    e = ks.shape[0]
    pad = (-e) % (CROWS * LANES)
    if pad:
        ks = jnp.concatenate([ks, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
    live = int(jnp.sum(ks != jnp.uint32(0xFFFFFFFF)))
    off8, live_rows = plan_compact(ks)
    packed = int(live_rows) * LANES
    rows = ks.shape[0] // LANES
    ncells = rows // CROWS
    v = np.asarray((ks.reshape(ncells, CROWS, LANES)
                    != jnp.uint32(0xFFFFFFFF)).sum(axis=1))
    mean_col = v.mean(axis=1)
    max_col = v.max(axis=1)
    print(f"E = {e} (+{pad} pad), live = {live} ({live/e:.1%})")
    print(f"packed = {packed} ({packed/e:.1%} of E), "
          f"slack = {(packed-live)/max(live,1):.1%} over live")
    print(f"per-cell col mean {mean_col.mean():.1f}, col max avg "
          f"{max_col.mean():.1f} (CROWS={CROWS}, cells={ncells})")
    print(f"avg (max-mean)/CROWS per cell = "
          f"{((max_col-mean_col)/CROWS).mean():.1%}")


if __name__ == "__main__":
    main()
