#!/bin/bash
# Round-4 stage 2: full-resolution e2e quality + depth-init throughput.
# Launch DETACHED (setsid nohup) so it survives the builder session:
#   setsid nohup bash scripts/onchip_r4d.sh > results/onchip_r4d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
mkdir -p results
export GS_BENCH_SKIP_PROBE=1

echo "=== full-scale e2e quality 1296x840 (sfm vs monocular_depth) $(date +%H:%M:%S) ==="
timeout 10800 python scripts/e2e_quality.py \
  --width 1296 --height 840 --cams 28 --steps 6000 \
  --out results/e2e_tpu_full > results/e2e_tpu_full.log 2>&1 \
  || echo "e2e full-scale FAILED (see results/e2e_tpu_full.log)"
tail -8 results/e2e_tpu_full.log || true

echo "=== depth-init throughput refresh $(date +%H:%M:%S) ==="
timeout 3600 python scripts/bench_depth.py \
  2>results/bench_depth_r4.err | tee results/bench_depth_r4.json \
  || echo "bench_depth FAILED"

echo "=== r4d done $(date +%H:%M:%S) ==="
