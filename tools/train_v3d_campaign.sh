#!/bin/bash
# v3d capacity-probe campaign (round 5, VERDICT r4 item 2): the one
# controlled architecture experiment inside v3's ~2.7 ms device headroom.
# v3d = v3 + signed warped-difference input to stage 2 (r_in 13 -> 17 ch;
# models/rife.py init_params3 stage2_diff).  Warm start: the bundled v3
# head expanded with ZERO weights on the new channels — bit-identical to
# v3 at step 0, so training can only move away from a 40.91 dB start.
# Gate: the device rate at the hardest cell (4K->4K fps doubling) must
# stay >= 60 output fps (profile_step device column) or the variant is a
# recorded dead end.
# One TPU client, strictly sequential, every stage bounded.
#   [SKIP_PROBE=1] bash tools/train_v3d_campaign.sh [outdir] [steps] [lr] [seed]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/train_v3d}"
STEPS="${2:-3000}"
LR="${3:-1e-4}"
SEED="${4:-17}"
CK="$OUT/v3d.npz"
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
  # seeding runs on CPU (PYTHONPATH cleared to bypass the axon
  # sitecustomize) and bounded: a bare python here would open an
  # unbounded TPU client, violating the one-bounded-client discipline
  # (review finding, r5)
  env PYTHONPATH= JAX_PLATFORMS=cpu timeout 900 python - <<EOF
from tpufg.models import rife
from tpufg.utils.checkpoint import save_pytree
save_pytree("$CK", rife.expand_v3_stage2_diff(
    rife.load_params("checkpoints/head64_v3.npz")))
print("seeded $CK (zero-padded warm start from head64_v3)")
EOF
fi

# 0. rate gate FIRST: if v3d cannot hold 60 fps device-bound at 4K->4K,
#    record the dead end without spending the training budget
stage rate_v3d 1800 python tools/profile_step.py --mode learned -k 2 \
  --in-w 3840 --in-h 2160 --out-mult 1 --model-path "$CK"
# baseline pinned explicitly: the tools' default is now the NEWEST
# bundled head (v4), which would silently mislabel this comparison
stage rate_v3 1800 python tools/profile_step.py --mode learned -k 2 \
  --in-w 3840 --in-h 2160 --out-mult 1 \
  --model-path checkpoints/head64_v3.npz

stage train 5400 python -m tpufg.models.train "synth:$SEED" --arch v3d \
  --steps "$STEPS" --cosine --lr "$LR" --flow-weight 0.1 --batch 4 \
  --crop 128x192 --resume "$CK" --checkpoint "$CK" --save-every 500 \
  --log-every 100

stage eval_clean 1800 python tools/eval_natural.py --pairs 8 --no-gate \
  --model-path "$CK" --modes learned
stage eval_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --no-gate --model-path "$CK" --modes learned

echo "campaign done -> $OUT"
