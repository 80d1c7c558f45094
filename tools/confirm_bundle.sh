#!/bin/bash
# Confirmation eval of a BUNDLED checkpoint's exact bytes (verdict r4
# item 3: bundling a default must be gated on a committed eval log of the
# bundled file, not on a trajectory-identity argument).  Runs the four
# load-bearing evals — clean, grain, mult 3, mult 4 — against the given
# checkpoint and leaves the logs in artifacts/confirm_<name>/ to be
# committed next to the bundle.  One TPU client, strictly sequential,
# every stage bounded (tpu-relay discipline).
#   [SKIP_PROBE=1] bash tools/confirm_bundle.sh [checkpoint] [pairs]
set -u
cd "$(dirname "$0")/.."
CK="${1:-checkpoints/head64_v3.npz}"
PAIRS="${2:-8}"
NAME="$(basename "${CK%.npz}")"
OUT="artifacts/confirm_$NAME"
mkdir -p "$OUT"
sha256sum "$CK" | tee "$OUT/sha256.txt"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ), timeout ${t}s)"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"
  tail -6 "$OUT/$name.log" | sed 's/^/    /'
}

if [ -z "${SKIP_PROBE:-}" ]; then
  stage probe 480 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
  grep -q PROBE_OK "$OUT/probe.log" || { echo 'relay wedged; aborting'; exit 1; }
fi

stage eval_clean 1800 python tools/eval_natural.py --pairs "$PAIRS" \
  --no-gate --model-path "$CK" --modes learned
stage eval_grain 1800 python tools/eval_natural.py --pairs "$PAIRS" --grain \
  --no-gate --model-path "$CK" --modes learned
stage eval_mult3 1800 python tools/eval_natural.py --pairs 6 --no-gate \
  --mult 3 --model-path "$CK" --modes learned
stage eval_mult4 1800 python tools/eval_natural.py --pairs 6 --no-gate \
  --mult 4 --model-path "$CK" --modes learned

echo "confirmation logs -> $OUT (commit them beside the bundle)"
