#!/bin/bash
# Round-3 on-chip session, stage 1: correctness sanity then the flag A/B
# sweep. Run as soon as the TPU relay recovers; e2e (stage 2) is launched
# manually after reviewing the A/B results.
#
# The Hillis-Steele compositing scans (91c3f94) have never run on real
# hardware. If sanity fails with the default lowering, automatically retry
# with GS_SCAN=trimat (the hardware-proven v1 triangular-matmul lowering)
# and, if that passes, pin it for the whole sweep — an unattended recovery
# still yields usable data either way.
#
# Usage: bash scripts/onchip_r3.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results
# The relay was just probed healthy to get here; skip bench.py's own
# bounded pre-probe (one less tiny executable per sweep row).
export GS_BENCH_SKIP_PROBE=1

sanity() {  # sanity <logfile> [ENV=VAL ...]
  local log="$1"; shift
  env "$@" timeout 900 python scripts/tpu_sanity.py 2>&1 | tee "$log" \
    && grep -q "SANITY PASS" "$log"
}

echo "=== stage 1a: on-chip sanity (Pallas vs oracle, fwd+bwd) ==="
SCAN_PIN=""
if ! sanity results/sanity_r3.log; then
  echo "SANITY FAILED with Hillis-Steele scans — retrying with GS_SCAN=trimat"
  if sanity results/sanity_r3_trimat.log GS_SCAN=trimat; then
    echo "trimat fallback PASSES — pinning GS_SCAN=trimat for the sweep" \
      | tee results/SCAN_FALLBACK_NEEDED
    SCAN_PIN="trimat"
  else
    echo "SANITY FAILED under both lowerings — aborting (inspect results/sanity_r3*.log)"
    exit 1
  fi
fi

echo "=== stage 1b: flag A/B sweep (fresh process per config) ==="
if [ -n "$SCAN_PIN" ]; then
  GS_SCAN="$SCAN_PIN" bash scripts/ab_bench.sh r3
else
  bash scripts/ab_bench.sh r3
fi
echo "=== stage 1 done: see results/ab_bench.log ==="

# Stage 2 (auto-chained so an unattended recovery still lands everything;
# flag flips into Config defaults happen afterwards, by hand, from the
# sweep results). Each stage is independent — a failure logs and moves on.
S2ENV=()
[ -n "$SCAN_PIN" ] && S2ENV=(GS_SCAN="$SCAN_PIN")

echo "=== stage 2a: default-flag bench refresh ==="
env "${S2ENV[@]}" timeout 1800 python bench.py 2>results/bench_r3_refresh.err \
  | tee results/bench_r3_refresh.json || echo "bench refresh FAILED"

echo "=== stage 2b: full-scale e2e quality (sfm vs monocular_depth) ==="
env "${S2ENV[@]}" timeout 14400 python scripts/e2e_quality.py \
  --out results/e2e_tpu_full > results/e2e_tpu_full.log 2>&1 \
  || echo "e2e full-scale FAILED (see results/e2e_tpu_full.log)"
tail -5 results/e2e_tpu_full.log || true

echo "=== stage 2c: depth-init throughput (BASELINE.json imgs/sec) ==="
env "${S2ENV[@]}" timeout 3600 python scripts/bench_depth.py \
  2>results/bench_depth_r3.err | tee results/bench_depth_r3.json \
  || echo "bench_depth FAILED"

echo "=== done: stages 1+2 complete ==="
