#!/usr/bin/env bash
# Hardware A/B sweep of the queued sort/compositor knobs (PERF_NOTES.md
# "Queued hardware A/Bs"). Run on the real TPU chip:
#   bash scripts/ab_hw.sh [splats]
# Each variant runs the headline config (BASELINE config 1) WITH the
# per-stage breakdown in its own child process, so a wedged kernel can't
# kill the sweep and every row shows front-end / sort / composite splits.
set -u
cd "$(dirname "$0")/.."
SPLATS="${1:-6000000}"
# Sweep rows are hardware evidence — keep them in-repo (VERDICT r3 item 3)
OUT="${AB_OUT:-hwruns/$(date +%Y%m%d)/ab_hw_$(date +%H%M%S).log}"
mkdir -p "$(dirname "$OUT")"
echo "sweep log: $OUT"

run() {
  local label="$1"; shift
  echo "--- $label" | tee -a "$OUT"
  # stdout = the child's JSON; stderr carries the per-stage breakdown and
  # per-config fps lines. Full output goes to a per-variant file so a
  # failing run is diagnosable; the summary log keeps the headline lines.
  local full="${OUT%.log}.$label.full"
  "$@" timeout 900 python bench.py --config 1 --breakdown \
      --splats "$SPLATS" > "$full" 2>&1
  local rc=$?
  grep -E "breakdown:|config1|\"ok\"" "$full" | tee -a "$OUT"
  [ $rc -ne 0 ] && echo "!! $label rc=$rc (see $full)" | tee -a "$OUT"
}

run baseline            env
run nofuse              env GS_SORT_FUSE_L1=0
run block128             env GS_SORT_BLOCK_ROWS=128
run block128_nofuse      env GS_SORT_BLOCK_ROWS=128 GS_SORT_FUSE_L1=0
run block_rows=512      env GS_SORT_BLOCK_ROWS=512
run chunk_rows=128      env GS_MERGE_CHUNK_ROWS=128
run chunk_rows=256      env GS_MERGE_CHUNK_ROWS=256
run comp_rowmajor       env GS_COMPOSITE_TRANSPOSED=0
echo "=== sweep complete; winners -> PERF_NOTES.md" | tee -a "$OUT"
