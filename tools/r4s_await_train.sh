#!/bin/bash
# Round-4 closer: await a green relay, then reproduce warm-restart #2
# (the 40.91-dB head lost with the previous VM — its checkpoint lived
# only in gitignored .data/).  Campaign output goes under artifacts/ so
# the weights survive in git this time.
set -u
cd "$(dirname "$0")/.."
OUT="artifacts/train_v3r2b"
DEADLINE=$(( $(date +%s) + 3000 ))
while [ "$(date +%s)" -lt "$DEADLINE" ]; do
  echo "[await] probe at $(date -u +%H:%M:%SZ)"
  if timeout 420 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))" 2>&1 | grep -q PROBE_OK; then
    echo "[await] GREEN at $(date -u +%H:%M:%SZ); starting restart campaign"
    # checkpoint path defaults to $OUT/v3r2.npz inside the campaign, so
    # every --save-every step lands in the committed tree (advisor r4)
    bash tools/train_v3r2_campaign.sh "$OUT" 3000 1e-4 7
    exit $?
  fi
  echo "[await] not green; sleeping 60s"
  sleep 60
done
echo "[await] gave up"
exit 1
