#!/bin/bash
# v3 (streaming head) training campaign — the v2f recipe on the v3 arch:
# from-scratch on the infinite fresh-scene flow-supervised feed, cosine
# schedule.  One TPU client, strictly sequential.
#   bash tools/train_v3_campaign.sh [outdir] [steps]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.data/train_v3_$(date -u +%Y%m%dT%H%M%SZ)}"
STEPS="${2:-6000}"
mkdir -p "$OUT" .data/ckpt

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ), timeout ${t}s)"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

stage probe 300 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
grep -q PROBE_OK "$OUT/probe.log" || { echo 'relay wedged; aborting'; exit 1; }

CK=.data/ckpt/v3_sup.npz
stage train 14400 python -m tpufg.models.train synth:0 --arch v3 \
  --steps "$STEPS" --cosine --flow-weight 0.1 --batch 4 --crop 128x192 \
  --checkpoint "$CK" --save-every 500 --log-every 100

# eval on the rich corpus (held-out eval seed), clean + grain
stage eval_clean 1800 python tools/eval_natural.py --pairs 8 --no-gate \
  --model-path "$CK" --modes learned
stage eval_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --no-gate --model-path "$CK" --modes learned

# rate: the trained checkpoint through the engine at the hardest cell
stage rate_5b 1500 python tools/bench_matrix.py --only 5b \
  --model-path "$CK" -n 30

echo "campaign done -> $OUT"
