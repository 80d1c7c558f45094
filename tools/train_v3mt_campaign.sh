#!/bin/bash
# Multi-t fine-tune campaign (round 4 close / round 5): fine-tune the
# best v3 head with --multi-t — random off-midpoint targets through the
# t-scaled tails — so the head trains on the SAME math the k>2
# deployment path runs, instead of only extrapolating constant velocity
# from midpoint training (docs/NEXT.md named this the multi-rate
# refinement; rotation/zoom content bends constant velocity at k>2's
# outer time points).  Evals score k=2 (must not regress) AND mult 3/4
# (the payoff) against the starting head.
# One TPU client, strictly sequential, every stage bounded.
#   [SKIP_PROBE=1] bash tools/train_v3mt_campaign.sh [outdir] [steps] [lr] [seed] [base_ck]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/train_v3mt}"
STEPS="${2:-2000}"
LR="${3:-5e-5}"
SEED="${4:-13}"
BASE="${5:-checkpoints/head64_v3.npz}"
CK="$OUT/v3mt.npz"
mkdir -p "$OUT"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ), timeout ${t}s)"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

if [ -z "${SKIP_PROBE:-}" ]; then
  stage probe 480 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
  grep -q PROBE_OK "$OUT/probe.log" || { echo 'relay wedged; aborting'; exit 1; }
fi

if [ -f "$CK" ] && [ -z "${RESUME:-}" ]; then
  # stale-checkpoint guard (advisor r4): refuse a silent continuation
  echo "ERROR: $CK already exists; set RESUME=1 to continue it, or use a fresh outdir"
  exit 1
fi
if [ ! -f "$CK" ]; then
  cp "$BASE" "$CK"   # warm-restart seed = the head under refinement
fi
# checkpoint lives in $OUT (committed tree): a VM recycle mid-run keeps
# the last save-every step plus the sidecar for a true resume
stage train 5400 python -m tpufg.models.train "synth:$SEED" --arch v3 \
  --steps "$STEPS" --cosine --lr "$LR" --flow-weight 0.1 --batch 4 \
  --crop 128x192 --multi-t --resume "$CK" --checkpoint "$CK" \
  --save-every 500 --log-every 100

for mult in 2 3 4; do
  stage "eval_m$mult" 1800 python tools/eval_natural.py --pairs 8 \
    --no-gate --mult "$mult" --model-path "$CK" --modes learned
  stage "eval_base_m$mult" 1800 python tools/eval_natural.py --pairs 8 \
    --no-gate --mult "$mult" --model-path "$BASE" --modes learned
done

echo "campaign done -> $OUT"
