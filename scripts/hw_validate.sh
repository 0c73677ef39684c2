#!/usr/bin/env bash
# Full hardware validation pass — run on the real TPU chip after kernel
# changes (one JAX process at a time on the axon tunnel: make sure no
# other bench/pytest is running first).
#
#   bash scripts/hw_validate.sh [outdir]
#
# 1. TPU-gated test suite (compiled Mosaic kernels vs the XLA paths on
#    the chip: fused front-end, gated fused, geometry pass, compositor,
#    merge sort, ragged_all_to_all routing, dup truncation bounds).
# 2. Headline bench with per-stage breakdown.
# 3. Full bench (all five BASELINE configs incl. the dup=8 quality row).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/hw_validate}"
mkdir -p "$OUT"
echo "logs -> $OUT"

echo "== TPU-gated tests"
GS_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -q \
  2>&1 | tee "$OUT/pytest_tpu.log" | tail -5

echo "== headline breakdown"
timeout 1800 python bench.py --config 1 --breakdown 2>&1 \
  | tee "$OUT/breakdown.log" | grep -E "breakdown:|config1"

echo "== full bench"
timeout 7200 python bench.py 2> "$OUT/bench_stderr.log" \
  | tee "$OUT/bench.json"
grep -E "config[0-9]" "$OUT/bench_stderr.log" || true
echo "done — update PERF_NOTES.md / README.md with measured rows only"
