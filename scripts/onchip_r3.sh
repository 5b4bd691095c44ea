#!/bin/bash
# Round-3 on-chip session, stage 1: correctness sanity then the flag A/B
# sweep. Run as soon as the TPU relay recovers; e2e (stage 2) is launched
# manually after reviewing the A/B results.
#
# Usage: bash scripts/onchip_r3.sh
set -u
cd "$(dirname "$0")/.."
mkdir -p results

echo "=== stage 1a: on-chip sanity (Pallas vs oracle, fwd+bwd) ==="
if ! timeout 900 python scripts/tpu_sanity.py 2>&1 | tee results/sanity_r3.log; then
  echo "SANITY FAILED — aborting before the sweep (inspect results/sanity_r3.log)"
  exit 1
fi
if ! grep -q "SANITY PASS" results/sanity_r3.log; then
  echo "SANITY DID NOT PASS — aborting before the sweep"
  exit 1
fi

echo "=== stage 1b: flag A/B sweep (fresh process per config) ==="
bash scripts/ab_bench.sh r3
echo "=== done: see results/ab_bench.log ==="
