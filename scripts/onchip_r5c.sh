#!/bin/bash
# Round-5 stage C (final hour): A/B the still-unmeasured knobs at the
# flagship point, refresh the 3M row, then a medium-res 3-arm e2e if time
# remains. Short measurements FIRST (round-4 lesson, VERDICT #7).
# Launch: setsid nohup bash scripts/onchip_r5c.sh > results/onchip_r5c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/ab_r5c.log

run() {
  local name="$1"; shift
  echo "=== $name $(date +%H:%M:%S) env: $*" | tee -a "$LOG"
  env "$@" timeout 600 python bench.py 2> >(tail -3 >&2) | tee -a "$LOG"
}

# Flagship 300k: refresh last-good at HEAD (wire8 default ON), then the
# two knobs built this round but never measured on chip.
run default_r5c
run pblock2 GS_PBLOCK=2
run pblock4 GS_PBLOCK=4
run moment_bf16 GS_MOMENT=bf16
# 3M operating point: default refresh + pblock (termination granularity
# matters most on deep stacks) — VERDICT #6.
run default_3m GS_BENCH_N=3000000
run pblock4_3m GS_BENCH_N=3000000 GS_PBLOCK=4
echo "=== r5c measurements done $(date +%H:%M:%S) ===" | tee -a "$LOG"

# Medium-res on-chip 3-arm e2e (VERDICT #8 at a budget that fits).
timeout 2400 python scripts/e2e_quality.py \
  --width 648 --height 420 --cams 12 --steps 800 \
  --out results/e2e_tpu_r5c > results/e2e_tpu_r5c.log 2>&1 \
  || echo "e2e FAILED (see results/e2e_tpu_r5c.log)" | tee -a "$LOG"
tail -12 results/e2e_tpu_r5c.log | tee -a "$LOG"
echo "=== r5c done $(date +%H:%M:%S) ===" | tee -a "$LOG"
