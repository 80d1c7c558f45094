#!/bin/bash
# Round-5 master campaign: the two queued learned-head probes from the
# r4 verdict (item 1), strictly sequential, one TPU client, detach-safe.
#   (a) multi-t fine-tune of the bundled head  -> artifacts/train_v3mt
#   (b) warm-restart #3 (seed synth:11)        -> artifacts/train_v3r3
# Probes once up front with retries, then passes SKIP_PROBE=1 down (a
# flapping lease can hang a second probe client even after a green one —
# memory: tpu-relay-discipline).  Usage:
#   setsid nohup bash tools/r5_campaign.sh > artifacts/r5_campaign.out 2>&1 &
set -u
cd "$(dirname "$0")/.."

echo "[r5] start $(date -u +%H:%M:%SZ)"
GREEN=0
for attempt in 1 2 3 4; do
  echo "[r5] probe attempt $attempt ($(date -u +%H:%M:%SZ))"
  if timeout 480 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))" 2>&1 | grep -q PROBE_OK; then
    GREEN=1; break
  fi
  echo "[r5] probe failed; backing off 120s"
  sleep 120
done
[ "$GREEN" = 1 ] || { echo "[r5] relay wedged after 4 probes; giving up"; exit 1; }
echo "[r5] relay green $(date -u +%H:%M:%SZ)"

echo "[r5] === multi-t fine-tune campaign ==="
SKIP_PROBE=1 bash tools/train_v3mt_campaign.sh artifacts/train_v3mt 2000 5e-5 13
echo "[r5] mt campaign rc=$?"

echo "[r5] === warm-restart #3 campaign (seed synth:11) ==="
SKIP_PROBE=1 bash tools/train_v3r2_campaign.sh artifacts/train_v3r3 3000 1e-4 11
echo "[r5] r3 campaign rc=$?"

echo "[r5] done $(date -u +%H:%M:%SZ)"
