#!/bin/bash
# Photometric fine-tune campaign (round 5, VERDICT r4 item 4): fine-tune
# the bundled head with a MIXED scene stream — photo_p of the triplets
# drawn with the photometric axes on (motion blur, flicker, noise
# mismatch, perspective background; data/corpus.py Scene photo=True) —
# so the head learns real-video photometry without unlearning the clean
# corpus.  Evals: photo-clean and photo-grain (the payoff) plus the
# plain clean row (the non-regression gate vs the seeding head).
# One TPU client, strictly sequential, every stage bounded.
#   [SKIP_PROBE=1] bash tools/train_v3p_campaign.sh [outdir] [steps] [lr] [seed] [base] [photo_p]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/train_v3p}"
STEPS="${2:-2000}"
LR="${3:-5e-5}"
SEED="${4:-23}"
# default base: the round-5 v3d head (40.96 clean at unchanged rate) —
# the photometric fine-tune should start from the best head available
BASE="${5:-artifacts/train_v3d/v3d.npz}"
PHOTO_P="${6:-0.35}"
CK="$OUT/v3p.npz"
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
  echo "ERROR: $CK already exists; set RESUME=1 to continue it, or use a fresh outdir"
  exit 1
fi
if [ ! -f "$CK" ]; then
  # arch inferred from the checkpoint at load; works for v3 and v3d bases
  cp "$BASE" "$CK"
fi
ARCH=v3
# CPU-bounded arch sniff (one-bounded-client discipline; review r5)
env PYTHONPATH= JAX_PLATFORMS=cpu timeout 900 python - <<EOF && ARCH=v3d
from tpufg.models import rife
import sys
sys.exit(0 if rife.has_stage2_diff(rife.load_params("$CK")) else 1)
EOF

stage train 5400 python -m tpufg.models.train "synth:$SEED" --arch "$ARCH" \
  --steps "$STEPS" --cosine --lr "$LR" --flow-weight 0.1 --batch 4 \
  --crop 128x192 --photo-p "$PHOTO_P" --resume "$CK" --checkpoint "$CK" \
  --save-every 500 --log-every 100

for tagflags in "photo:--photo" "photo_grain:--photo --grain" "clean:"; do
  tag="${tagflags%%:*}"; flags="${tagflags#*:}"
  stage "eval_$tag" 1800 python tools/eval_natural.py --pairs 8 --no-gate \
    $flags --model-path "$CK" --modes learned
  stage "eval_base_$tag" 1800 python tools/eval_natural.py --pairs 8 \
    --no-gate $flags --model-path "$BASE" --modes learned
done

echo "campaign done -> $OUT"
