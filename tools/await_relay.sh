#!/bin/bash
# Probe the axon relay on a bounded cadence; on the first green probe run
# the full measurement campaign.  Single-client discipline: probes are
# strictly sequential, each bounded (timeout), and the campaign starts only
# after a probe process has fully exited.  Usage:
#   bash tools/await_relay.sh [campaign_outdir] [interval_s] [max_hours]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.data/tpu_campaign_$(date -u +%Y%m%dT%H%M%SZ)}"
INTERVAL="${2:-1200}"
MAXH="${3:-10}"
DEADLINE=$(( $(date +%s) + MAXH * 3600 ))

while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  echo "[await_relay] probe at $(date -u +%H:%M:%SZ)"
  if timeout 300 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('PROBE_OK', float(jnp.ones((8,128)).sum()))" 2>&1 | grep -q PROBE_OK; then
    echo "[await_relay] relay GREEN at $(date -u +%H:%M:%SZ); starting campaign"
    if bash tools/tpu_campaign.sh "$OUT"; then
      exit 0
    fi
    # the campaign itself found the lease wedged (it can flap: one green
    # probe, then a hang on the next client) — keep waiting
    echo "[await_relay] campaign aborted on a wedged lease; resuming probes"
  fi
  echo "[await_relay] still wedged; sleeping ${INTERVAL}s"
  sleep "$INTERVAL"
done
echo "[await_relay] gave up after ${MAXH}h"
exit 1
