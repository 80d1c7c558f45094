#!/bin/bash
# Round-4 v2-head training campaign (one TPU client, strictly sequential).
#
# Trains the two-stage coarse-to-fine IFNet on the rich natural corpus
# (seeds 11-14, held out from every eval seed), then fast-consistent
# fine-tunes it on the deployed inference tail, then evaluates v1 vs v2
# on the rich corpus.  Usage: bash tools/train_v2_campaign.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.data/train_v2_$(date -u +%Y%m%dT%H%M%SZ)}"
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

# 1. smooth training, sequential epochs over the 4 held-out seeds
CK=.data/ckpt/v2_smooth.npz
stage train_s11 3000 python -m tpufg.models.train .data/corpus/rich_s11.y4m \
  --arch v2 --steps 400 --batch 4 --crop 128x192 --skip-cuts 0.12 \
  --checkpoint "$CK"
for s in 12 13 14; do
  stage train_s$s 3000 python -m tpufg.models.train .data/corpus/rich_s$s.y4m \
    --arch v2 --steps 400 --batch 4 --crop 128x192 --skip-cuts 0.12 \
    --resume "$CK" --checkpoint "$CK"
done

# 2. fast-consistent fine-tune (the deployed integer-lattice tail)
FT=.data/ckpt/v2_ft.npz
stage train_ft 3000 python -m tpufg.models.train .data/corpus/rich_s11.y4m \
  --arch v2 --steps 300 --batch 4 --crop 128x192 --skip-cuts 0.12 --ft \
  --lr 3e-5 --resume "$CK" --checkpoint "$FT"

# 3. eval: v1 (bundled) vs v2 smooth vs v2 ft on the rich corpus
stage eval_v1   1800 python tools/eval_natural.py --pairs 8 --modes learned
stage eval_v2   1800 python tools/eval_natural.py --pairs 8 --modes learned \
  --model-path "$CK"
stage eval_v2ft 1800 python tools/eval_natural.py --pairs 8 --modes learned \
  --model-path "$FT"

echo "campaign done -> $OUT"
