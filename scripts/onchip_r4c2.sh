#!/bin/bash
# Resume r4c: the 3M rows interrupted at 08:34.
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
run ext_3m GS_BENCH_N=3000000
run ext_3m_sortbf16 GS_BENCH_N=3000000 GS_BENCH_SORT_BF16=1
echo "=== r4c2 done ===" | tee -a "$LOG"
