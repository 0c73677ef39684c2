"""Benchmark harness — BASELINE.json configs on the local accelerator.

Prints ONE summary JSON line:
  {"metric": "fps_1080p_6m_splats", "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is against the driver-assigned target of 60 FPS @1080p on a
~6M-splat scene per chip (BASELINE.md; the reference publishes no numbers).

Extra per-config results go to stderr so stdout stays a single JSON line.

Fault tolerance (round-1 postmortem: one transient FailedPrecondition on a
warm-up frame zeroed the whole capture): the default invocation is an
ORCHESTRATOR that never touches the device itself — every config runs in
its own child process (`--config N`) with a timeout and one retry in a
fresh process (= full backend re-init). The summary line always prints,
with per-config `error` fields for anything that failed both attempts.

Capture discipline (round-3 postmortem: the driver's fixed window expired
mid-run and the one summary print at the very end lost every completed
config — BENCH_r03.json rc=124, parsed null):
  * the CUMULATIVE summary JSON line is re-printed after EVERY config (and
    after every headline sub-measurement, streamed out of the child as
    {"partial": ...} lines) — the last stdout line always holds the best
    summary so far, so a window kill can no longer zero the capture;
  * the headline config (1) runs FIRST; 0/2/3/4 follow;
  * the probe is capped at 2 attempts / ~5 min and its failure is NOT
    fatal (round 3: backend init took >600 s once, then succeeded);
  * a GS_BENCH_DEADLINE wall clock (default 1500 s) bounds the whole run —
    configs that don't fit are skipped with an error field, and the final
    summary always prints before the deadline;
  * the compile cache lives in the repo (.jax_cache/), so hardware runs
    during the build warm the exact cache the driver's bench run reads.
"""

import argparse
import json
import os
import queue as queue_mod
import subprocess
import sys
import threading
import time
import traceback

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

_T0 = time.time()
_DEADLINE = float(os.environ.get("GS_BENCH_DEADLINE", "1500"))

# Persistent compile cache: first-run compiles on this platform go through a
# slow remote helper; cached reruns are instant. Children share the cache.
# Repo-local (gitignored) so it survives /tmp wipes between the build
# session and the driver's capture run on the same checkout.
_CACHE_DIR = os.environ.get("JAX_COMPILATION_CACHE_DIR") or os.path.join(
    os.path.dirname(os.path.abspath(__file__)), ".jax_cache"
)
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
# Ambient plugin shims ignore the JAX_PLATFORMS env var; mirror it through
# the config API so `JAX_PLATFORMS=cpu python bench.py --quick` works even
# when the TPU runtime is unreachable (CI / tunnel-down smoke runs).
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass  # backend already initialized


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _remaining():
    """Seconds left on the GS_BENCH_DEADLINE wall clock."""
    return _DEADLINE - (time.time() - _T0)


def emit_partial(results):
    """Child mode: stream a measurement upward the moment it exists so the
    parent can fold it into the cumulative summary line (a window kill
    mid-child then loses only the unfinished measurement, not the run)."""
    print(json.dumps({"partial": {k: round(v, 4) for k, v in results.items()}}),
          flush=True)


def build(n, w, h, sh_degree, display_mode, tile=32, max_dup=4, seed=0):
    from wgpu_3dgs_viewer_app_tpu.core import CameraOrbitControl
    from wgpu_3dgs_viewer_app_tpu.data import Compressions, make_random_scene, pack_gaussians
    from wgpu_3dgs_viewer_app_tpu.ops import TileConfig

    comp = Compressions()
    scene = make_random_scene(n, seed=seed, extent=2.0, scale_range=(0.004, 0.02))
    pod = {k: jnp.asarray(v) for k, v in pack_gaussians(scene, comp).items()}
    cam = CameraOrbitControl(target=(0, 0, 0), pos=(0, 0, -6))
    view = jnp.asarray(cam.view())
    proj = jnp.asarray(cam.projection(w / h))
    cfg = TileConfig(w, h, tile=tile, max_dup=max_dup)
    return comp, pod, view, proj, cfg


def frame_fn(comp, cfg, sh_degree, display_mode, use_pallas):
    from wgpu_3dgs_viewer_app_tpu.ops import (
        build_sorted_entries,
        build_sorted_entries_fused,
        composite_tiles_jnp_v2,
        composite_tiles_pallas_v2,
        preprocess,
    )

    def step(pod, view, proj):
        flat = display_mode != 0
        if use_pallas:
            entries = build_sorted_entries_fused(
                pod, comp, cfg, view, proj, jnp.eye(4),
                sh_degree=sh_degree, display_mode=display_mode,
            )
            return composite_tiles_pallas_v2(entries, cfg, flat_mode=flat)
        pre = preprocess(
            pod, comp, view, proj, jnp.eye(4), cfg.width, cfg.height,
            sh_degree=sh_degree, display_mode=display_mode,
        )
        entries = build_sorted_entries(pre, cfg)
        return composite_tiles_jnp_v2(entries, cfg, flat_mode=flat)

    return step


def time_frames(step, args, iters=10, warmup=2):
    """Pipelined frames-per-second: enqueue `iters` frames back-to-back and
    force completion once at the end (the device executes its stream in
    order, so the last frame's checksum gates all of them). This is how an
    interactive renderer runs — frames in flight, no per-frame host sync —
    and it keeps the axon tunnel's ~35 ms scalar-readback latency out of the
    per-frame cost. Completion is forced with a tiny device reduce + host
    transfer (`block_until_ready` can return early on this platform — see
    PERF_NOTES.md)."""
    for _ in range(warmup):
        float(step(*args).ravel()[0:1].sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = step(*args)
    float(out.ravel()[0:1].sum())
    return (time.perf_counter() - t0) / iters


def bench_breakdown(comp, pod, view, proj, cfg):
    """Per-stage device time of the headline frame: cumulative pipelined
    timings of (front-end), (front-end + sort), (full frame) — differences
    give the stage split (each prefix is its own jit; the front-end's
    output planes are reduced to force materialization)."""
    import jax
    import jax.numpy as jnp

    from wgpu_3dgs_viewer_app_tpu.ops.fused import (
        enumerate_entries_fused,
        sort_and_range_entries,
    )
    from wgpu_3dgs_viewer_app_tpu.ops import composite_tiles_pallas_v2

    @jax.jit
    def fe(pod, view, proj):
        ks, p1, p2, p3 = enumerate_entries_fused(
            pod, comp, cfg, view, proj, jnp.eye(4), sh_degree=3, display_mode=0
        )
        return (ks[::65536].astype(jnp.uint32) ^ p1[::65536] ^ p2[::65536]
                ^ p3[::65536]).astype(jnp.float32)

    @jax.jit
    def fe_sort(pod, view, proj):
        ks, p1, p2, p3 = enumerate_entries_fused(
            pod, comp, cfg, view, proj, jnp.eye(4), sh_degree=3, display_mode=0
        )
        ent = sort_and_range_entries(ks, p1, p2, p3, cfg)
        return ent.planes[::4096, 0, :1].astype(jnp.float32)

    @jax.jit
    def full(pod, view, proj):
        ks, p1, p2, p3 = enumerate_entries_fused(
            pod, comp, cfg, view, proj, jnp.eye(4), sh_degree=3, display_mode=0
        )
        ent = sort_and_range_entries(ks, p1, p2, p3, cfg)
        return composite_tiles_pallas_v2(ent, cfg, flat_mode=False)

    t_fe = time_frames(fe, (pod, view, proj), iters=10)
    t_fs = time_frames(fe_sort, (pod, view, proj), iters=10)
    t_full = time_frames(full, (pod, view, proj), iters=10)
    log(
        f"breakdown: front-end {t_fe*1e3:.1f} ms | sort {((t_fs-t_fe))*1e3:.1f} ms"
        f" | composite+tail {(t_full-t_fs)*1e3:.1f} ms | total {t_full*1e3:.1f} ms"
    )


def bench_config2(results):
    """BASELINE config 2: 3 models, per-model transforms + color edits,
    composited back-to-front in one frame (ref multi-model scene)."""
    import jax.numpy as jnp
    import numpy as np

    from wgpu_3dgs_viewer_app_tpu.core import CameraOrbitControl, ModelTransform
    from wgpu_3dgs_viewer_app_tpu.core.edit import EDIT_FLAG_ENABLED
    from wgpu_3dgs_viewer_app_tpu.data import make_random_scene
    from wgpu_3dgs_viewer_app_tpu.viewer import MultiModelViewer

    w, h = 1920, 1088
    viewer = MultiModelViewer(w, h, tile=32, max_dup=4)
    placements = ((-2.0, 0.0), (0.0, 40.0), (2.0, -40.0))
    for i, (dxx, rot) in enumerate(placements):
        g = make_random_scene(1_000_000, seed=i, extent=1.5, scale_range=(0.004, 0.02))
        m = viewer.add_model(f"m{i}", g)
        viewer.update_model_transform(
            f"m{i}",
            ModelTransform(
                pos=np.array([dxx, 0.0, 0.0], np.float32),
                rot=np.array([0.0, rot, 0.0], np.float32),
            ),
        )
        # Per-model color edit: hue shift + saturation scale on every splat.
        n = m.buffers.edit_flags.shape[0]
        m.buffers.set_edits(
            jnp.full(n, EDIT_FLAG_ENABLED, jnp.uint32),
            jnp.broadcast_to(jnp.asarray([0.08 * i, 1.1, 1.0], jnp.float32), (n, 3)),
            m.buffers.edit_params,
        )
    cam = CameraOrbitControl(target=(0, 0, 0), pos=(0, 0, -7))
    viewer.update_camera(cam)

    def step():
        return viewer.render()

    for _ in range(2):
        float(step().ravel()[0:1].sum())
    t0 = time.perf_counter()
    out = None
    for _ in range(6):
        out = step()
    float(out.ravel()[0:1].sum())
    dt = (time.perf_counter() - t0) / 6
    results["config2_multimodel_fps"] = 1.0 / dt
    log(f"config2 (3x1M multi-model 1080p): {dt*1000:.2f} ms = {1/dt:.1f} fps")


def bench_config3(results):
    """BASELINE config 3: rect selection pass + color edit on 2M splats."""
    import jax.numpy as jnp

    from wgpu_3dgs_viewer_app_tpu.core.edit import EDIT_FLAG_ENABLED
    from wgpu_3dgs_viewer_app_tpu.ops import (
        build_sorted_entries,
        composite_tiles_pallas_v2,
        preprocess,
    )
    from wgpu_3dgs_viewer_app_tpu.query import select_rect
    from wgpu_3dgs_viewer_app_tpu.ops import TileConfig

    comp, pod, view, proj, cfg = build(2_000_000, 1920, 1088, 3, 0)
    use_pallas = jax.default_backend() == "tpu"
    sel_edit = (
        jnp.uint32(EDIT_FLAG_ENABLED),
        jnp.asarray([0.15, 1.2, 1.0], jnp.float32),
        jnp.asarray([0.1, 0.2, 1.0, 1.0], jnp.float32),
    )
    hl = jnp.asarray([1.0, 0.0, 1.0, 0.4], jnp.float32)

    def step(pod, view, proj):
        # Selection geometry pass: degree-0 (means/valid only) — mirrors the
        # app's `_preprocess_selected` trim (app/state.py), which skips the
        # SH color math the query never reads; on TPU it is one fused
        # Pallas kernel (ops/fused.preprocess_geometry_fused).
        if use_pallas:
            from wgpu_3dgs_viewer_app_tpu.ops.fused import (
                preprocess_geometry_fused,
            )

            pre = preprocess_geometry_fused(
                pod, comp, view, proj, jnp.eye(4), cfg.width, cfg.height,
                display_mode=0,
            )
        else:
            pre = preprocess(
                pod, comp, view, proj, jnp.eye(4), cfg.width, cfg.height,
                sh_degree=0, display_mode=0,
            )
        bits = select_rect(pre, (400.0, 200.0), (1400.0, 800.0))
        if use_pallas:
            # Selection edit + highlight ride the fused kernel's gating
            # inputs — same front-end as the plain orbit path.
            from wgpu_3dgs_viewer_app_tpu.ops import build_sorted_entries_fused

            entries = build_sorted_entries_fused(
                pod, comp, cfg, view, proj, jnp.eye(4),
                sh_degree=3, display_mode=0,
                selection_bits=bits, selection_edit=sel_edit,
                highlight_rgba=hl,
            )
            return composite_tiles_pallas_v2(entries, cfg)
        pre2 = preprocess(
            pod, comp, view, proj, jnp.eye(4), cfg.width, cfg.height,
            sh_degree=3, display_mode=0,
            selection_bits=bits, selection_edit=sel_edit, highlight_rgba=hl,
        )
        entries = build_sorted_entries(pre2, cfg)
        from wgpu_3dgs_viewer_app_tpu.ops import composite_tiles_jnp_v2

        return composite_tiles_jnp_v2(entries, cfg)

    dt = time_frames(step, (pod, view, proj), iters=8)
    results["config3_selection_edit_fps"] = 1.0 / dt
    log(f"config3 (2M rect-select + edit 1080p): {dt*1000:.2f} ms = {1/dt:.1f} fps")


def bench_config4(results):
    """BASELINE config 4: composite shape masks gating 6M splats at 1080p."""
    import jax.numpy as jnp

    from wgpu_3dgs_viewer_app_tpu.mask import MaskEvaluator, MaskShape, MaskShapeKind, parse
    from wgpu_3dgs_viewer_app_tpu.ops import (
        build_sorted_entries,
        composite_tiles_pallas_v2,
        composite_tiles_jnp_v2,
        preprocess,
    )

    comp, pod, view, proj, cfg = build(6_000_000, 1920, 1088, 3, 0)
    use_pallas = jax.default_backend() == "tpu"
    shapes = [
        MaskShape(kind=MaskShapeKind.BOX, pos=(0, 0, 0), scale=(1.5, 1.5, 1.5)).to_pod(),
        MaskShape(kind=MaskShapeKind.ELLIPSOID, pos=(0.5, 0, 0), scale=(1.0, 1.0, 1.0)).to_pod(),
        MaskShape(kind=MaskShapeKind.BOX, pos=(-0.5, 0.4, 0), scale=(0.6, 0.6, 0.6)).to_pod(),
    ]
    op = parse("(0 | 1) - 2")
    # Component planes straight from the pod's (3, N_pad) row storage — the
    # evaluator's fast path (25 ms -> ~1 ms over 6M on v5e: no (N, 3)
    # device array, no (N,3)@(3,3) tiny matmuls).
    ev = jax.jit(lambda x, y, z: MaskEvaluator().evaluate(op, shapes, (x, y, z)))
    import numpy as _np

    pr = _np.asarray(pod["pos"], _np.float32).reshape(3, -1)
    pts = tuple(jnp.asarray(pr[i]) for i in range(3))
    bits = ev(*pts)
    float(bits[0:1].sum())  # compile
    t0 = time.perf_counter()
    float(ev(*pts)[0:1].sum())
    log(f"config4 mask eval over 6M: {(time.perf_counter()-t0)*1000:.2f} ms")

    def step(pod, view, proj, bits):
        if use_pallas:
            # Mask bits gate inside the fused kernel (no XLA preprocess).
            from wgpu_3dgs_viewer_app_tpu.ops import build_sorted_entries_fused

            entries = build_sorted_entries_fused(
                pod, comp, cfg, view, proj, jnp.eye(4),
                sh_degree=3, display_mode=0, mask_bits=bits,
            )
            return composite_tiles_pallas_v2(entries, cfg)
        pre = preprocess(
            pod, comp, view, proj, jnp.eye(4), cfg.width, cfg.height,
            sh_degree=3, display_mode=0, mask_bits=bits,
        )
        entries = build_sorted_entries(pre, cfg)
        return composite_tiles_jnp_v2(entries, cfg)

    dt = time_frames(step, (pod, view, proj, bits), iters=8)
    results["config4_masked_6m_fps"] = 1.0 / dt
    log(f"config4 (6M mask-gated 1080p): {dt*1000:.2f} ms = {1/dt:.1f} fps")


def bench_config0(results, iters=10):
    """BASELINE config 0: synthetic 50k, 800x600-ish, point mode, SH0
    (CPU-runnable)."""
    use_pallas = jax.default_backend() == "tpu"
    comp, pod, view, proj, cfg = build(50_000, 800, 608, 0, 2)
    step = frame_fn(comp, cfg, 0, 2, use_pallas)
    dt = time_frames(step, (pod, view, proj), iters=iters)
    results["config0_50k_point_fps"] = 1.0 / dt
    log(f"config0 (50k point 800x608): {dt*1000:.2f} ms = {1/dt:.1f} fps")


def bench_config1(results, n=6_000_000, breakdown=False):
    """BASELINE config 1 (the headline): ~6M splats, 1080p, SH3, splat mode
    (ellipse flat mode is cheaper; splat mode is the honest headline).

    Headline knobs == the PRODUCT DEFAULT (tile=32, max_dup=4; viewer.py) —
    dup=4's truncation bound vs dup=16 is measured at mean 5.0e-2 /
    p99.9 0.55 (tests/test_image_tpu.py). A second row benches the dup=8
    quality preset (2.6e-2 / 0.40) so both published configs are honest."""
    use_pallas = jax.default_backend() == "tpu"
    comp, pod, view, proj, cfg = build(n, 1920, 1088, 3, 0)
    step = frame_fn(comp, cfg, 3, 0, use_pallas)
    dt = time_frames(step, (pod, view, proj), iters=10)
    results["config1_6m_1080p_fps"] = 1.0 / dt
    log(f"config1 ({n} splat 1080p SH3, tile=32 dup=4 default): "
        f"{dt*1000:.2f} ms = {1/dt:.1f} fps")
    emit_partial(results)  # headline secured before the dup8 quality row
    if breakdown:
        bench_breakdown(comp, pod, view, proj, cfg)
        return
    if use_pallas:
        import dataclasses

        # Same scene/pod — only the tile config's dup budget changes (a
        # rebuild would re-synthesize + re-upload 6M splats for nothing).
        cfg8 = dataclasses.replace(cfg, max_dup=8)
        step8 = frame_fn(comp, cfg8, 3, 0, use_pallas)
        dt8 = time_frames(step8, (pod, view, proj), iters=8)
        results["config1_quality_dup8_fps"] = 1.0 / dt8
        log(f"config1 quality preset (dup=8): {dt8*1000:.2f} ms = {1/dt8:.1f} fps")


CONFIG_FNS = {
    "0": bench_config0,
    "1": bench_config1,
    "2": bench_config2,
    "3": bench_config3,
    "4": bench_config4,
}


def run_single(args):
    """Child mode: run ONE config, print {"ok", "backend", "results"|"error"}
    as the sole stdout line (rc is always 0 — the parent reads the JSON)."""
    out = {"ok": True, "results": {}}
    try:
        if args.inject_fail == args.config:
            raise RuntimeError(f"injected failure for config {args.config}")
        out["backend"] = jax.default_backend()
        if args.config == "probe":
            # Touch the device once: one tiny jit round-trip.
            val = float(jnp.asarray([1.0, 2.0]).sum())
            assert val == 3.0
        elif args.config == "1":
            if args.trace:
                # XLA/op-level device trace (xprof; view with tensorboard).
                with jax.profiler.trace(args.trace):
                    bench_config1(out["results"], n=args.splats or 6_000_000,
                                  breakdown=args.breakdown)
                log(f"trace written to {args.trace}")
            else:
                bench_config1(out["results"], n=args.splats or 6_000_000,
                              breakdown=args.breakdown)
        else:
            CONFIG_FNS[args.config](out["results"])
    except BaseException as e:  # noqa: BLE001 — children report, never crash
        traceback.print_exc(file=sys.stderr)
        out = {"ok": False, "error": f"{type(e).__name__}: {e}",
               "results": out.get("results", {}),
               "backend": out.get("backend", "unknown")}
    print(json.dumps(out), flush=True)


def _run_child_once(config, timeout, extra=(), on_partial=None):
    """Run one config child, STREAMING its stdout lines: {"partial": ...}
    lines are folded upward immediately via on_partial (so the parent can
    re-emit the cumulative summary while the child is still running); the
    final line is the child's result dict. On timeout/crash, whatever
    partial results arrived are salvaged into the error dict."""
    cmd = [sys.executable, os.path.abspath(__file__), "--config", config, *extra]
    try:
        p = subprocess.Popen(cmd, stdout=subprocess.PIPE, stderr=None)
    except Exception as e:  # noqa: BLE001
        return {"ok": False, "error": f"{type(e).__name__}: {e}", "results": {}}
    q = queue_mod.Queue()

    def reader():
        for raw in p.stdout:
            q.put(raw)
        q.put(None)

    threading.Thread(target=reader, daemon=True).start()
    t_end = time.time() + timeout
    partial = {}
    last_obj = None
    while True:
        try:
            raw = q.get(timeout=min(5.0, max(0.1, t_end - time.time())))
        except queue_mod.Empty:
            if time.time() >= t_end:
                p.kill()
                return {"ok": False, "error": f"timeout after {int(timeout)}s",
                        "results": partial}
            continue
        if raw is None:
            break
        line = raw.decode(errors="replace").strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except ValueError:
            continue
        last_obj = obj
        if "partial" in obj:
            partial = obj["partial"]
            if on_partial:
                on_partial(partial)
    p.wait()
    if last_obj is None or "partial" in last_obj:
        return {"ok": False, "error": f"no final output (rc={p.returncode})",
                "results": partial}
    return last_obj


def _run_child(config, timeout, extra=(), retries=1, on_partial=None,
               first_cap=None):
    """One fresh-process retry (= full TPU backend re-init) on failure,
    bounded by the bench deadline.

    `first_cap` bounds the FIRST attempt only (round-4 postmortem: a dead
    tunnel init burned the entire 1154 s window in one child — but in
    round 3 a fresh process connected in minutes right after a 600 s init
    timeout, and compiles finished before a kill persist in the on-disk
    cache, so the retry resumes rather than restarts). A capped first
    attempt + a full-window second attempt dominates one long attempt in
    both failure modes."""
    last = {"ok": False, "error": "not run", "results": {}}
    for attempt in range(retries + 1):
        if attempt:
            if _remaining() < 90:
                log(f"config {config}: skipping retry (deadline)")
                break
            log(f"config {config}: retrying in a fresh process")
        t = min(timeout, max(60.0, _remaining() - 45.0))
        if attempt == 0 and first_cap:
            t = min(t, float(first_cap))
        last = _run_child_once(config, t, extra=extra, on_partial=on_partial)
        if last.get("ok"):
            return last
        log(f"config {config} attempt {attempt + 1} failed: {last.get('error')}")
    return last


def _probe(passthrough):
    """Bounded device probe: 2 attempts, ~5 min total. NON-FATAL — round-3
    postmortem: the first backend init on a cold tunnel can exceed any sane
    probe timeout and then succeed, so a failed probe downgrades to a
    warning and the headline config still gets its shot (children do their
    own full backend init anyway)."""
    timeout = int(os.environ.get("GS_BENCH_PROBE_TIMEOUT", "140"))
    sleep = int(os.environ.get("GS_BENCH_PROBE_SLEEP", "20"))
    probe = _run_child_once("probe", timeout, extra=passthrough)
    if not probe.get("ok"):
        log(f"probe attempt 1 failed ({probe.get('error')}); retrying in {sleep}s")
        time.sleep(sleep)
        probe = _run_child_once("probe", timeout, extra=passthrough)
    return probe


def orchestrate(args):
    """Parent mode: never touches the device. Runs the HEADLINE config
    first, then 0/2/3/4, each in a child with a deadline-capped timeout +
    one fresh-process retry, and re-prints the cumulative summary line
    after every config (and every streamed partial) so the last stdout
    line is always the best summary so far."""
    results = {}
    errors = {}
    passthrough = []
    if args.inject_fail:
        passthrough += ["--inject-fail", args.inject_fail]

    cpu_mode = {"on": False}

    def emit():
        if cpu_mode["on"]:
            fps = results.get("config0_50k_point_fps", 0.0)
            summary = {
                "metric": "fps_800x608_50k_splats_point",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 3),
            }
        else:
            fps = results.get("config1_6m_1080p_fps", 0.0)
            summary = {
                "metric": "fps_1080p_6m_splats",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 60.0, 3),
                "configs": {k: round(v, 2) for k, v in results.items()},
            }
        if errors:
            summary["errors"] = errors
        print(json.dumps(summary), flush=True)

    def on_partial(partial):
        results.update(partial)
        emit()

    probe = _probe(passthrough)
    backend = probe.get("backend", "unknown")
    log(f"probe: backend={backend} ok={probe.get('ok')} "
        f"(deadline {_DEADLINE:.0f}s, {_remaining():.0f}s left)")
    if not probe.get("ok"):
        errors["probe"] = probe.get("error", "?")
    # Decide the summary format BEFORE the first emit so a non-TPU run's
    # early line already uses the CPU metric name (advisor r4: the early
    # emit printed the TPU metric, later lines switched — inconsistent for
    # consumers that don't strictly take the last line).
    cpu_mode["on"] = bool(probe.get("ok")) and backend != "tpu"
    # A parseable (if zero-valued) summary exists from minute ~5 onward —
    # a capture window that dies during the first config still records a
    # well-formed line instead of nothing (round-4 postmortem: the first
    # summary printed only after the headline child's 1154 s init timeout).
    emit()

    if cpu_mode["on"]:
        # CPU/other backend: the 6M headline would take hours — measure the
        # CPU-runnable BASELINE config 0 instead (CI / tunnel-down runs).
        r = _run_child("0", min(900, max(60, _remaining() - 45)),
                       extra=passthrough)
        results.update(r.get("results", {}))
        if not r.get("ok"):
            errors["config0"] = r.get("error", "?")
        emit()
        return

    # TPU — or unknown (probe failed): proceed optimistically; the headline
    # child performs its own backend init and reports what it found.
    plan = [("1", 1500), ("0", 600)]
    if args.breakdown:
        # Per-stage diagnostic of the headline config only.
        plan = [("1", 1500)]
    elif args.headline_only:
        pass
    else:
        plan = plan + [("2", 900), ("3", 900), ("4", 900)]

    def run_plan(plan_items, retries=1):
        failed = []
        for config, budget in plan_items:
            if _remaining() < 120:
                errors[f"config{config}"] = "skipped: bench deadline"
                failed.append((config, budget))
                continue
            extra = list(passthrough)
            if config == "1":
                if args.splats:
                    extra += ["--splats", str(args.splats)]
                if args.breakdown:
                    extra += ["--breakdown"]
            # The 600 s first-attempt cap on the headline is justified only
            # when a full-window retry follows (advisor r4: the lone
            # recovery attempt must get the whole remaining window).
            r = _run_child(config, budget, extra=extra, retries=retries,
                           on_partial=on_partial if config == "1" else None,
                           first_cap=600 if (config == "1" and retries > 0)
                           else None)
            results.update(r.get("results", {}))
            if not r.get("ok"):
                errors[f"config{config}"] = r.get("error", "?")
                failed.append((config, budget))
                if config == "1" and r.get("backend", backend) == "unknown" \
                        and not results:
                    # No backend ever materialized: later configs would all
                    # burn their timeouts on the same dead init. Stop here.
                    log("no backend reachable; aborting remaining configs")
                    break
            else:
                errors.pop(f"config{config}", None)
            emit()
        return failed

    failed = run_plan(plan)
    if failed and _remaining() > 240:
        # End-of-window recovery: if the device is back, the failures were
        # transient (tunnel blip) — rerun just those configs once.
        log(f"{len(failed)} config(s) failed; re-probing before final retry")
        reprobe = _run_child_once("probe", 120, extra=passthrough)
        if reprobe.get("ok"):
            run_plan(failed, retries=0)

    emit()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="small scene only (CI/CPU)")
    ap.add_argument("--splats", type=int, default=None)
    ap.add_argument(
        "--headline-only",
        action="store_true",
        help="skip BASELINE configs 2-4 (multi-model / selection / mask)",
    )
    ap.add_argument(
        "--breakdown",
        action="store_true",
        help="per-stage device timing of the headline config (front-end / sort / composite)",
    )
    ap.add_argument(
        "--config", default=None,
        help="child mode: run ONE config (probe/0/1/2/3/4) and print its JSON",
    )
    ap.add_argument(
        "--trace", default=None, metavar="DIR",
        help="child mode with --config 1: wrap the headline bench in a "
             "jax.profiler device trace written to DIR",
    )
    ap.add_argument(
        "--inject-fail", default=None, metavar="CONFIG",
        help="testing: make the given config raise (proves capture robustness)",
    )
    args = ap.parse_args()

    if args.config is not None:
        run_single(args)
        return

    if args.quick:
        # In-process fast path for CI / CPU smoke runs.
        backend = jax.default_backend()
        log(f"backend={backend} devices={jax.devices()}")
        results = {}
        bench_config0(results, iters=5)
        fps = results["config0_50k_point_fps"]
        print(json.dumps({
            "metric": "fps_800x608_50k_splats_point",
            "value": round(fps, 2),
            "unit": "fps",
            "vs_baseline": round(fps / 60.0, 3),
        }))
        return

    orchestrate(args)


if __name__ == "__main__":
    main()
