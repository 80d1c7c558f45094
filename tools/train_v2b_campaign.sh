#!/bin/bash
# Round-4b v2-head retraining campaign (one TPU client, strictly sequential).
#
# Retrains the two-stage IFNet with the round-4b trainer fixes: all 4
# held-out corpus seeds INTERLEAVED (the 4a campaign trained them
# sequentially — the last seed dominated), cosine lr, 2400 steps; then
# evaluates v1 vs the retrain on the rich corpus (clean + grain, eval
# seed 1, held out), times config 5b at 4K with the new checkpoint
# (fractional-flow tail), and fast-consistent fine-tunes as a final
# optional stage.  Usage: bash tools/train_v2b_campaign.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.data/train_v2b_$(date -u +%Y%m%dT%H%M%SZ)}"
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

CK=.data/ckpt/v2b.npz
stage train 3600 python -m tpufg.models.train \
  .data/corpus/rich_s11.y4m .data/corpus/rich_s12.y4m \
  .data/corpus/rich_s13.y4m .data/corpus/rich_s14.y4m \
  --arch v2 --steps 2400 --batch 4 --crop 128x192 --skip-cuts 0.12 \
  --lr 2e-4 --cosine --checkpoint "$CK"

stage eval_v1_clean  1800 python tools/eval_natural.py --pairs 8 --modes learned
stage eval_v2b_clean 1800 python tools/eval_natural.py --pairs 8 --modes learned \
  --model-path "$CK"
stage eval_v1_grain  1800 python tools/eval_natural.py --pairs 8 --grain \
  --modes learned
stage eval_v2b_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --modes learned --model-path "$CK"

stage time_5b 1200 python tools/bench_matrix.py --only 5b --model-path "$CK"

FT=.data/ckpt/v2b_ft.npz
stage train_ft 1800 python -m tpufg.models.train \
  .data/corpus/rich_s11.y4m .data/corpus/rich_s12.y4m \
  .data/corpus/rich_s13.y4m .data/corpus/rich_s14.y4m \
  --arch v2 --steps 400 --batch 4 --crop 128x192 --skip-cuts 0.12 --ft \
  --lr 2e-5 --resume "$CK" --checkpoint "$FT"
stage eval_v2bft_clean 1800 python tools/eval_natural.py --pairs 8 \
  --modes learned --model-path "$FT"

echo "campaign done -> $OUT"
