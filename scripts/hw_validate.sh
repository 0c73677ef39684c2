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
# RESUMABLE PER-ARTIFACT (VERDICT r4 item 8): each stage skips itself if
# its log already ends in a stage-OK sentinel, so a tunnel blip mid-pass
# costs only the stage it killed — re-run the script to continue. Force a
# full redo by removing the outdir (or individual logs).
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
OKTAG="HW_VALIDATE_STAGE_OK"

done_already() {  # $1 = log file
  [ -f "$1" ] && tail -1 "$1" 2>/dev/null | grep -q "$OKTAG"
}
mark_ok() { echo "$OKTAG" >> "$1"; }

if done_already "$OUT/pytest_tpu.log"; then
  echo "== TPU-gated tests (already passed — skipping)"
else
  echo "== TPU-gated tests"
  # -n 0 forces serial: xdist workers must not share the tunnel.
  GS_TPU_TESTS=1 timeout 3600 python -m pytest tests/ -m tpu -q -n 0 \
    2>&1 | tee "$OUT/pytest_tpu.log" | tail -5
  tail -3 "$OUT/pytest_tpu.log" | grep -qE "passed" \
    && ! tail -3 "$OUT/pytest_tpu.log" | grep -qE "failed|error" \
    && mark_ok "$OUT/pytest_tpu.log"
fi

if done_already "$OUT/golden_tpu.log"; then
  echo "== TPU golden (already passed — skipping)"
else
  echo "== TPU golden"
  if [ ! -f tests/golden/golden_tpu_256.png ]; then
    timeout 900 python scripts/gen_golden.py --update --backend-tpu \
      2>&1 | tee "$OUT/golden_tpu.log"
  fi
  if timeout 900 python scripts/gen_golden.py --backend-tpu \
      >> "$OUT/golden_tpu.log" 2>&1; then
    mark_ok "$OUT/golden_tpu.log"
  fi
  tail -3 "$OUT/golden_tpu.log"
fi

if done_already "$OUT/breakdown.log"; then
  echo "== headline breakdown (already captured — skipping)"
else
  echo "== headline breakdown"
  timeout 1800 python bench.py --config 1 --breakdown 2>&1 \
    | tee "$OUT/breakdown.log" | grep -E "breakdown:|config1"
  grep -q "breakdown:" "$OUT/breakdown.log" && mark_ok "$OUT/breakdown.log"
fi

if done_already "$OUT/sort_levels.log"; then
  echo "== sort levels (already captured — skipping)"
else
  echo "== sort levels"
  timeout 2400 python scripts/bench_sort.py --levels 2>&1 \
    | tee "$OUT/sort_levels.log" | tail -15
  grep -qE "level" "$OUT/sort_levels.log" && mark_ok "$OUT/sort_levels.log"
fi

if done_already "$OUT/bench.json"; then
  echo "== full bench (already captured — skipping)"
else
  echo "== full bench"
  GS_BENCH_DEADLINE=5400 timeout 5700 python bench.py \
    2> "$OUT/bench_stderr.log" | tee "$OUT/bench.json"
  grep -E "config[0-9]" "$OUT/bench_stderr.log" || true
  grep -q '"vs_baseline"' "$OUT/bench.json" && mark_ok "$OUT/bench.json"
fi
echo "done — commit $OUT and update PERF_NOTES.md / README.md with measured rows only"
