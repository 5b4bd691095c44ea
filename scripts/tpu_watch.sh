#!/bin/bash
# Poll the TPU relay with a tiny probe until it answers, then (optionally)
# chain straight into the stage-1 on-chip runbook so no recovery time is
# wasted. Each probe is a fresh interpreter (import-time retry-sleep means
# a hung probe just gets killed by timeout). Exits 0 on recovery (after the
# chained command, if any), 1 after ~12 h.
#
# Usage: tpu_watch.sh [--run-onchip]
set -u
cd "$(dirname "$0")/.."
CHAIN="${1:-}"
for i in $(seq 1 144); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128), jnp.bfloat16)
print('TPU_OK', float((x@x).sum()), jax.devices())
" 2>/dev/null | grep -q TPU_OK; then
    echo "TPU RECOVERED at $(date -u +%H:%M:%S) (probe $i)"
    if [ "$CHAIN" = "--run-onchip" ]; then
      echo "chaining into scripts/onchip_r3.sh"
      bash scripts/onchip_r3.sh
    fi
    exit 0
  fi
  echo "probe $i: relay still down at $(date -u +%H:%M:%S)"
  sleep 60
done
echo "TPU still down after 12 h of polling"
exit 1
