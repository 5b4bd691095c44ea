#!/bin/bash
# Round-5 stage B: A/B the unmeasured knobs at the new wire8 default,
# refresh the 3M row, fresh 300k profile, then the full-res 3-arm e2e.
# Short measurements run FIRST so a wall-clock cutoff cannot starve them
# (round-4 lesson, VERDICT #7).
# Launch: setsid nohup bash scripts/onchip_r5b.sh > results/onchip_r5b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
LOG=results/ab_r5b.log

run() {
  local name="$1"; shift
  echo "=== $name $(date +%H:%M:%S) env: $*" | tee -a "$LOG"
  env "$@" timeout 1800 python bench.py 2> >(tail -3 >&2) | tee -a "$LOG"
}

# Flagship point: default (wire8 now ON via cfg), moment-bf16 variant
# (built round 5, never measured — commit a7617c5 queued it).
run default_r5b
run moment_bf16 GS_MOMENT=bf16
# 3M operating point: first measurement since wire8; +wire16 control to
# isolate the wire format's contribution at 7.2M pairs; +moment_bf16.
run default_3m GS_BENCH_N=3000000
run wire16_3m GS_BENCH_N=3000000 GS_WIRE=16
run moment_bf16_3m GS_BENCH_N=3000000 GS_MOMENT=bf16

echo "=== profile 300k $(date +%H:%M:%S) ===" | tee -a "$LOG"
timeout 1800 python scripts/profile_bench.py 300000 \
  > results/prof_r5_300k.log 2>&1 || echo "profile FAILED" | tee -a "$LOG"
tail -30 results/prof_r5_300k.log | tee -a "$LOG"

echo "=== full-res 3-arm e2e 1296x840/28cams/3000 steps $(date +%H:%M:%S) ===" | tee -a "$LOG"
timeout 14400 python scripts/e2e_quality.py \
  --width 1296 --height 840 --cams 28 --steps 3000 \
  --out results/e2e_tpu_full_r5 > results/e2e_tpu_full_r5.log 2>&1 \
  || echo "e2e FAILED (see results/e2e_tpu_full_r5.log)" | tee -a "$LOG"
tail -12 results/e2e_tpu_full_r5.log | tee -a "$LOG"

echo "=== r5b done $(date +%H:%M:%S) ===" | tee -a "$LOG"
