#!/bin/bash
# v3 second warm-restart campaign (round 4 late): the bundled head came
# from 6000 steps + ONE 3000-step warm restart (fresh optimizer + cosine,
# artifacts/train_v3_ext) and that restart beat a 12000-step single
# cosine (artifacts/train_v3x: 40.52 vs 40.83) — so the measured lever is
# SGDR-style restarts, not longer schedules.  This runs restart #2 from
# the bundled checkpoint on a FRESH scene seed (synth:7 — the ext run
# replayed its original stream's opening scenes; a new seed strictly
# avoids replay) and evals clean+grain against the bundled 40.83/35.77.
# One TPU client, strictly sequential, every stage bounded.
#   bash tools/train_v3r2_campaign.sh [outdir] [steps] [lr] [seed] [ck]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/train_v3r2}"
STEPS="${2:-3000}"
LR="${3:-1e-4}"
SEED="${4:-7}"
# Checkpoint lives IN $OUT (committed tree) so every --save-every step
# survives a VM recycle via the driver's end-of-round auto-commit — the
# round-4 restart-#2 head was lost because it lived only in gitignored
# .data/ (advisor r4 finding).
CK="${5:-$OUT/v3r2.npz}"
mkdir -p "$OUT"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ), timeout ${t}s)"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

# SKIP_PROBE=1: the caller just probed green — a second probe client can
# itself block minutes in backend init on a flapping lease (observed
# 10:11Z 08-20: outer probe green in 57 s, inner probe rc=124 at 480 s)
# and the train stage's own bound already covers a slow init.
if [ -z "${SKIP_PROBE:-}" ]; then
  stage probe 480 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
  grep -q PROBE_OK "$OUT/probe.log" || { echo 'relay wedged; aborting'; exit 1; }
fi


if [ -f "$CK" ] && [ -z "${RESUME:-}" ]; then
  # A stale $CK from a previous run would make --resume silently continue
  # from already-restarted weights — a mislabeled run (advisor r4).  An
  # intentional continuation must say RESUME=1.
  echo "ERROR: $CK already exists; set RESUME=1 to continue it, or use a fresh outdir"
  exit 1
fi
if [ ! -f "$CK" ]; then
  cp checkpoints/head64_v3.npz "$CK"   # warm-restart seed = bundled head
fi
# 5400 s bounds a healthy 3000-step run (~25 min) plus relay-weather
# slack; a client wedged in backend init then wastes 90 min, not 4 h
# (never SIGTERM a TPU run — let timeout bound it)
stage train 5400 python -m tpufg.models.train "synth:$SEED" --arch v3 \
  --steps "$STEPS" --cosine --lr "$LR" --flow-weight 0.1 --batch 4 \
  --crop 128x192 --resume "$CK" --checkpoint "$CK" --save-every 500 \
  --log-every 100

# Persist the trained weights AND the resume sidecars next to the logs
# before anything else (advisor r4: the .state.npz/.ema.npz sidecars are
# what make next-round --resume a true resume).  No-ops when $CK already
# lives in $OUT (the default).
if [ "$(dirname "$CK")" != "$OUT" ]; then
  cp "$CK" "$OUT/$(basename "$CK")" 2>/dev/null || true
  for side in state ema; do
    s="${CK%.npz}.$side.npz"
    [ -f "$s" ] && cp "$s" "$OUT/$(basename "$s")"
  done
fi

stage eval_clean 1800 python tools/eval_natural.py --pairs 8 --no-gate \
  --model-path "$CK" --modes learned
stage eval_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --no-gate --model-path "$CK" --modes learned

echo "campaign done -> $OUT"
