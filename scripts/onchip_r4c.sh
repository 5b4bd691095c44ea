#!/bin/bash
# Round-4 on-chip session, part C: re-measure after elliptical-AABB binning
# (ops/projection.py extents -> tiles.bin_gaussians) — CPU-side pair count
# at the flagship scene dropped 42%, so every pair-proportional cost
# (both Pallas kernels, sorts, gathers, segment reduce) shrinks with it.
# One fresh process per timed row (program-swap rule, PERF.md).
#
# Usage: bash scripts/onchip_r4c.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results
export GS_BENCH_SKIP_PROBE=1
LOG=results/ab_bench_r4c.log

run() {
  local name="$1"; shift
  echo "=== $name $(date +%H:%M:%S) env: $*" | tee -a "$LOG"
  env "$@" timeout 1800 python bench.py 2> >(tail -3 >&2) | tee -a "$LOG"
}

# 1. New defaults (extents binning + blocked segred), flagship 300k.
run ext_default
# 2. Winning flag from the r4b sweep on top.
run ext_sortbf16 GS_BENCH_SORT_BF16=1
# 3. Segment-reduce lowering check under the smaller cap.
run ext_segred_cumsum GS_SEGRED=cumsum
# 4. 3M operating point.
run ext_3m GS_BENCH_N=3000000
run ext_3m_sortbf16 GS_BENCH_N=3000000 GS_BENCH_SORT_BF16=1
echo "=== r4c sweep done ===" | tee -a "$LOG"
