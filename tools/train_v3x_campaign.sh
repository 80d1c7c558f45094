#!/bin/bash
# v3 extended-schedule training campaign (round 4 late): the v2f recipe
# on the v3 streaming arch at DOUBLE the horizon, plus --ema Polyak
# averaging — the two remaining schedule-side levers on the measured
# 0.45 dB gap to v2f (docs/ROUND4.md v3 table).  Evals score BOTH the
# raw and the averaged head so the EMA gain is attributable.
# One TPU client, strictly sequential, every stage bounded.
#   bash tools/train_v3x_campaign.sh [outdir] [steps] [ema]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.data/train_v3x_$(date -u +%Y%m%dT%H%M%SZ)}"
STEPS="${2:-12000}"
EMA="${3:-0.999}"
mkdir -p "$OUT" .data/ckpt

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ), timeout ${t}s)"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

stage probe 480 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
grep -q PROBE_OK "$OUT/probe.log" || { echo 'relay wedged; aborting'; exit 1; }

CK=.data/ckpt/v3x_sup.npz
# resume-if-present: the sidecar makes this a TRUE resume, so re-running
# the campaign after a relay death continues the same schedule
RESUME=""
[ -f "$CK" ] && RESUME="--resume $CK"
stage train 28800 python -m tpufg.models.train synth:0 --arch v3 \
  --steps "$STEPS" --cosine --ema "$EMA" --flow-weight 0.1 --batch 4 \
  --crop 128x192 $RESUME --checkpoint "$CK" --save-every 500 \
  --log-every 100

# held-out evals: raw vs EMA head, clean + grain (rich corpus)
stage eval_raw_clean 1800 python tools/eval_natural.py --pairs 8 --no-gate \
  --model-path "$CK" --modes learned
stage eval_raw_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --no-gate --model-path "$CK" --modes learned
EMACK=.data/ckpt/v3x_sup.ema.npz
stage eval_ema_clean 1800 python tools/eval_natural.py --pairs 8 --no-gate \
  --model-path "$EMACK" --modes learned
stage eval_ema_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --no-gate --model-path "$EMACK" --modes learned

# rate: unchanged architecture, but record it against the same commit
stage rate_5b 1500 python tools/bench_matrix.py --only 5b \
  --model-path "$CK" -n 30

echo "campaign done -> $OUT"
