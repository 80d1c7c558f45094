#!/bin/bash
# Round-4d chain: wait for a green relay probe, then run the measurement
# campaign and the extended v3 training campaign back to back — strictly
# sequential, one TPU client at a time, every stage bounded.
#   bash tools/await_then_r4d.sh [max_hours]
set -u
cd "$(dirname "$0")/.."
MAXH="${1:-10}"
DEADLINE=$(( $(date +%s) + MAXH * 3600 ))

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  echo "[chain] probe at $(date -u +%H:%M:%SZ)"
  if timeout 480 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))" 2>&1 | grep -q PROBE_OK; then
    echo "[chain] relay GREEN at $(date -u +%H:%M:%SZ)"
    if bash tools/tpu_campaign.sh .data/tpu_campaign_r4d2; then
      echo "[chain] measurement campaign done; starting v3x training"
      bash tools/train_v3x_campaign.sh .data/train_v3x
      echo "[chain] all done at $(date -u +%H:%M:%SZ)"
      exit 0
    fi
    echo "[chain] campaign aborted on a wedged lease; resuming probes"
  fi
  echo "[chain] still wedged; sleeping 600s"
  sleep 600
done
echo "[chain] gave up after ${MAXH}h"
exit 1
