#!/bin/bash
# Resume the v3 streaming-head training from the last saved checkpoint
# (the r4 run died at step 2500/6000 when its session was interrupted),
# then run the held-out evals and the engine rate check.  One TPU
# client, strictly sequential, each stage bounded by a timeout — see
# docs/ROUND3.md (relay-wedge discipline).
# STEPS is the TOTAL training horizon (the sidecar <ckpt>.state.npz
# makes --resume a TRUE resume: the run continues from the saved step
# with its optimizer state, toward --steps total).
#   bash tools/resume_v3.sh [outdir] [total_steps]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.data/train_v3_resume}"
STEPS="${2:-6000}"
CK=.data/ckpt/v3_sup.npz
mkdir -p "$OUT"

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

# true resume when <ckpt>.state.npz exists (optimizer state + step;
# the cosine schedule and feed seed continue exactly); warm restart
# otherwise
stage train 14400 python -m tpufg.models.train synth:0 --arch v3 \
  --steps "$STEPS" --cosine --flow-weight 0.1 --batch 4 --crop 128x192 \
  --resume "$CK" --checkpoint "$CK" --save-every 500 --log-every 100

stage eval_clean 1800 python tools/eval_natural.py --pairs 8 --no-gate \
  --model-path "$CK" --modes learned
stage eval_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --no-gate --model-path "$CK" --modes learned

stage rate_5b 1500 python tools/bench_matrix.py --only 5b \
  --model-path "$CK" -n 30

echo "campaign done -> $OUT"
