#!/usr/bin/env bash
# Full hardware validation pass — run on the real TPU chip after kernel
# changes (one JAX process at a time on the axon tunnel: make sure no
# other bench/pytest is running first).
#
#   bash scripts/hw_validate.sh [outdir]
#
# Logs land IN-REPO under hwruns/<date>/ (VERDICT r3 item 3: /tmp-only
# logs proved nothing to the next round) — commit the directory.
#
# 1. TPU-gated test suite (compiled Mosaic kernels vs the XLA paths on
#    the chip: fused front-end, gated fused, geometry pass, compositor,
#    merge sort, ragged_all_to_all routing, dup truncation bounds).
# 2. TPU golden artifact: regenerate if absent, then diff (tight gates).
# 3. Headline bench with per-stage breakdown.
# 4. Per-merge-level sort timing (the samplesort planning data).
# 5. Full bench (all five BASELINE configs incl. the dup=8 quality row).
set -u
cd "$(dirname "$0")/.."
OUT="${1:-hwruns/$(date +%Y%m%d)}"
mkdir -p "$OUT"
echo "logs -> $OUT"

echo "== TPU-gated tests"
GS_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -q \
  2>&1 | tee "$OUT/pytest_tpu.log" | tail -5

echo "== TPU golden"
if [ ! -f tests/golden/golden_tpu_256.png ]; then
  timeout 900 python scripts/gen_golden.py --update --backend-tpu \
    2>&1 | tee "$OUT/golden_tpu.log"
fi
timeout 900 python scripts/gen_golden.py --backend-tpu \
  2>&1 | tee -a "$OUT/golden_tpu.log" | tail -2

echo "== headline breakdown"
timeout 1800 python bench.py --config 1 --breakdown 2>&1 \
  | tee "$OUT/breakdown.log" | grep -E "breakdown:|config1"

echo "== sort levels"
timeout 2400 python scripts/bench_sort.py --levels 2>&1 \
  | tee "$OUT/sort_levels.log" | tail -15

echo "== full bench"
GS_BENCH_DEADLINE=5400 timeout 5700 python bench.py \
  2> "$OUT/bench_stderr.log" | tee "$OUT/bench.json"
grep -E "config[0-9]" "$OUT/bench_stderr.log" || true
echo "done — commit $OUT and update PERF_NOTES.md / README.md with measured rows only"
