"""Test configuration: force CPU backend with 8 virtual devices.

Tests run on an 8-device virtual CPU mesh so multi-chip sharding paths
(`parallel/`) are exercised without TPU hardware. Set before jax import.

Hardware runs: `GS_TPU_TESTS=1 python -m pytest tests/ -m tpu` keeps the
ambient TPU backend so the `tpu`-marked tests (compiled Mosaic kernels,
end-to-end image equality on the chip) execute for real.
"""

import os

_TPU_RUN = os.environ.get("GS_TPU_TESTS") == "1"

if not _TPU_RUN:
    # Interpret-mode kernel cost scales with the sort block/chunk sizes; the
    # shipped defaults (256/512, tuned on hardware 2026-08-19) make the CPU
    # suite ~4x slower without exercising any additional layout branch (128
    # hits the same mixed-layout / subtile-parity paths). Pin the fast knobs
    # for CPU runs; `scripts/hw_validate.sh` (pytest -m tpu) compiles the
    # real kernels at the true defaults on the chip. Explicit env overrides
    # still win.
    os.environ.setdefault("GS_SORT_BLOCK_ROWS", "128")
    os.environ.setdefault("GS_MERGE_CHUNK_ROWS", "256")
    os.environ.setdefault("GS_COMPACT_CROWS", "128")
    # The TPU-tuned split-search defaults (binary + interpolation pre-round,
    # 2026-08-21) multiply interpret-mode sort cost for zero extra branch
    # coverage; pin the cheap search here. The interp/binary path itself is
    # covered explicitly by test_sort.py::test_split_interp_interpret via
    # module-level monkeypatching.
    os.environ.setdefault("GS_SORT_SPLIT_ARY", "4")
    os.environ.setdefault("GS_SORT_SPLIT_INTERP", "0")
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: ambient env may say axon/tpu
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax

if not _TPU_RUN:
    # Env vars alone are not enough: a pytest plugin may import jax before
    # this conftest runs, so pin the platform through the config API as well
    # (works any time before first backend creation).
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_gs3d_cpu")
else:
    # TPU runs share the repo-local cache with bench.py so hardware
    # validation passes pre-warm the driver's bench capture.
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def pytest_collection_modifyitems(config, items):
    import pytest

    # `slow`-marked tests (multi-minute interpret-mode kernel runs on slow
    # boxes) are opt-in: GS_SLOW_TESTS=1, or an explicit `-m slow`.
    run_slow = (os.environ.get("GS_SLOW_TESTS") == "1"
                or "slow" in (config.getoption("markexpr") or ""))
    skip_slow = pytest.mark.skip(
        reason="slow interpret-mode test (set GS_SLOW_TESTS=1 or -m slow)")
    skip_tpu = pytest.mark.skip(reason="TPU hardware test (set GS_TPU_TESTS=1)")
    for item in items:
        if not _TPU_RUN and "tpu" in item.keywords:
            item.add_marker(skip_tpu)
        if not run_slow and "slow" in item.keywords:
            item.add_marker(skip_slow)
