#!/bin/bash
# Round-5 measurement campaign (after the training campaigns):
#   1. bench.py            — healthy capture -> artifacts/bench_latest.json
#                            (same-code last-known-good for the driver bench)
#   2. on-chip pytest lane — compiled Mosaic kernels green on the chip
#   3. confirm_bundle      — committed confirmation evals of the bundled
#                            bytes (VERDICT r4 item 3a backfill)
#   4. photo-corpus evals  — the round-5 photometric axes, all modes,
#                            incl. the bf16 gate re-confirmed there (item 4)
#   5. decoded 1080p->4K   — codec round-trip at the north-star shape,
#                            mp4v + MJPG + XVID rows (item 5)
# One TPU client, strictly sequential, every stage bounded.
#   [SKIP_PROBE=1] bash tools/r5c_campaign.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-artifacts/tpu_campaign_r5c}"
mkdir -p "$OUT"
echo "logging to $OUT"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ), timeout ${t}s)"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"
  tail -5 "$OUT/$name.log" | sed 's/^/    /'
}

if [ -z "${SKIP_PROBE:-}" ]; then
  stage probe 480 python -c "
import jax, jax.numpy as jnp
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
  grep -q PROBE_OK "$OUT/probe.log" || { echo 'relay wedged; aborting'; exit 1; }
fi

# 4200s > bench.py's own worst case (3 probe retries + the 2400s inner
# budget ≈ 3960s): the stage bound must never SIGKILL the degraded-JSON
# emit (review finding, r5)
stage bench 4200 python bench.py
stage tpu_lane 3000 env TPUFG_TEST_TPU=1 python -m pytest tests/ -m tpu -q

SKIP_PROBE=1 bash tools/confirm_bundle.sh checkpoints/head64_v3.npz

# photo-corpus rows: every mode, clean + grain; the gate section (no
# --no-gate on the clean run) re-confirms bf16-vs-f32 SSIM >= 0.999 on
# the photometric content
stage eval_photo 3600 python tools/eval_natural.py --pairs 8 --photo \
  --modes crossfade,pyramid,quality,learned
stage eval_photo_grain 3600 python tools/eval_natural.py --pairs 8 --photo \
  --grain --no-gate --modes crossfade,pyramid,quality,learned
# reference rows at the same seed/pairs for the photo-vs-clean delta
stage eval_clean_ref 3600 python tools/eval_natural.py --pairs 8 --no-gate \
  --modes crossfade,pyramid,quality,learned

# decoded-content at the deployment shape: 1080p corpus -> codec
# round-trip -> engine 1080p->4K (interp + fused upscale), scored vs the
# identically-upscaled decoded truth
for codec in mp4v MJPG XVID; do
  stage "eval_decoded_1080p_$codec" 5400 python tools/eval_natural.py \
    --width 1920 --height 1080 --pairs 4 --no-gate --out-mult 2 \
    --codec "$codec" --modes crossfade,pyramid,quality,learned
done
# clean row at the same shape for the codec delta
stage eval_1080p_clean 5400 python tools/eval_natural.py \
  --width 1920 --height 1080 --pairs 4 --no-gate --out-mult 2 \
  --modes crossfade,pyramid,quality,learned

echo "campaign done -> $OUT"
