#!/usr/bin/env bash
# Hardware A/B sweep of the queued sort/compositor knobs (PERF_NOTES.md
# "Queued hardware A/Bs"). Run on the real TPU chip:
#   bash scripts/ab_hw.sh [splats]
# Each variant runs the headline config (BASELINE config 1) in its own
# child process so a wedged kernel can't kill the sweep.
set -u
cd "$(dirname "$0")/.."
SPLATS="${1:-6000000}"

run() {
  local label="$1"; shift
  echo "--- $label"
  "$@" timeout 900 python bench.py --config 1 --splats "$SPLATS" 2>/dev/null | tail -1
}

run baseline            env
run block_rows=256      env GS_SORT_BLOCK_ROWS=256
run block_rows=512      env GS_SORT_BLOCK_ROWS=512
run chunk_rows=128      env GS_MERGE_CHUNK_ROWS=128
run chunk_rows=512      env GS_MERGE_CHUNK_ROWS=512
run comp_rowmajor       env GS_COMPOSITE_TRANSPOSED=0
run block256_chunk128   env GS_SORT_BLOCK_ROWS=256 GS_MERGE_CHUNK_ROWS=128
