#!/bin/bash
# Round-4 on-chip session, part B: the experiments the r3 sweep could not
# run (it pinned GS_SCAN=trimat after the in-process probe poisoned the
# kernel trace — fixed by the subprocess probe, see rasterize._scan_mode).
# One fresh process per timed row (program-swap rule, PERF.md).
#
# Usage: bash scripts/onchip_r4b.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results
export GS_BENCH_SKIP_PROBE=1
LOG=results/ab_bench_r4b.log

run() {
  local name="$1"; shift
  echo "=== $name $(date +%H:%M:%S) env: $*" | tee -a "$LOG"
  env "$@" timeout 1800 python bench.py 2> >(tail -3 >&2) | tee -a "$LOG"
}

# 0. Genuine hardware answer for the HS-scan lowering (subprocess probe,
#    exclusive chip — nothing else running).
echo "=== hs probe $(date +%H:%M:%S)" | tee -a "$LOG"
timeout 600 python - <<'EOF' 2>&1 | tee -a "$LOG"
from gs_init_tpu.ops.rasterize import _probe_hs_scan
print("HS scan probe on real hardware:", "PASS" if _probe_hs_scan() else "FAIL")
EOF

# 1. Scan lowering A/B at fixed segred (cumsum = what the r3 numbers used).
run hs_cumsum GS_SCAN=hs GS_SEGRED=cumsum
# 2. New blocked segment reduce on top.
run hs_blocked GS_SCAN=hs GS_SEGRED=blocked
run trimat_blocked GS_SCAN=trimat GS_SEGRED=blocked
# 3. Winning scan + flags.
run hs_sortbf16 GS_SCAN=hs GS_SEGRED=blocked GS_BENCH_SORT_BF16=1
run hs_tile16 GS_SCAN=hs GS_SEGRED=blocked GS_BENCH_TILE=16
run hs_chunk256 GS_SCAN=hs GS_SEGRED=blocked GS_BENCH_CHUNK=256
# 4. 3M operating point with the likely winners.
run hs_3m GS_SCAN=hs GS_SEGRED=blocked GS_BENCH_N=3000000
run hs_3m_tile16 GS_SCAN=hs GS_SEGRED=blocked GS_BENCH_N=3000000 GS_BENCH_TILE=16
run hs_3m_sortbf16 GS_SCAN=hs GS_SEGRED=blocked GS_BENCH_N=3000000 GS_BENCH_SORT_BF16=1
echo "=== r4b sweep done ===" | tee -a "$LOG"
