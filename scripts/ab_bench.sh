#!/bin/bash
# A/B the flagship bench across rasterizer variants, one fresh process per
# run (program-swap latency, PERF.md). Results append to results/ab_bench.log.
# Usage: scripts/ab_bench.sh [label]
cd "$(dirname "$0")/.."
LOG=results/ab_bench.log
mkdir -p results
run() {
  local name="$1"; shift
  echo "=== $name $(date +%H:%M:%S) env: $*" | tee -a "$LOG"
  env "$@" timeout 1800 python bench.py 2> >(tail -3 >&2) | tee -a "$LOG"
}
run baseline
run reorder GS_BENCH_REORDER=1
run chunk256 GS_BENCH_CHUNK=256
run reorder_chunk256 GS_BENCH_REORDER=1 GS_BENCH_CHUNK=256
run sortbf16 GS_BENCH_SORT_BF16=1
run all_on GS_BENCH_REORDER=1 GS_BENCH_CHUNK=256 GS_BENCH_SORT_BF16=1
run segred_assoc GS_SEGRED=assoc
run scan_trimat GS_SCAN=trimat
# Tile 16: per-pair pixel work quarters (most (pair, pixel) combos are dead
# at tile 32 with small gaussians). The round-2 tile-32 win predates the
# Hillis-Steele scans / chunk-skip / moment-form rewrites — retest.
run tile16 GS_BENCH_TILE=16
run tile16_chunk256 GS_BENCH_TILE=16 GS_BENCH_CHUNK=256
# 3M-gaussian operating point (VERDICT #3): the flags that attack random-row
# gather locality and record-slot padding should matter MORE here — the
# attribute table is 192 MB at 3M, far past any cache.
run baseline_3m GS_BENCH_N=3000000
run reorder_3m GS_BENCH_N=3000000 GS_BENCH_REORDER=1
run chunk256_3m GS_BENCH_N=3000000 GS_BENCH_CHUNK=256
run all_on_3m GS_BENCH_N=3000000 GS_BENCH_REORDER=1 GS_BENCH_CHUNK=256 GS_BENCH_SORT_BF16=1
run tile16_3m GS_BENCH_N=3000000 GS_BENCH_TILE=16
