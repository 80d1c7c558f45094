#!/bin/bash
# Round-4 TPU measurement campaign — run when the relay probe is green.
#
# STRICTLY SEQUENTIAL (never two TPU clients: the round-3 wedge recipe),
# each stage bounded by a timeout and logged; a failing stage does not
# stop the rest.  Usage:  bash tools/tpu_campaign.sh [outdir]
set -u
cd "$(dirname "$0")/.."
OUT="${1:-.data/tpu_campaign_$(date -u +%Y%m%dT%H%M%SZ)}"
mkdir -p "$OUT"
echo "logging to $OUT"

stage() {  # stage <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name ($(date -u +%H:%M:%SZ), timeout ${t}s)"
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name rc=$rc"
  tail -4 "$OUT/$name.log" | sed 's/^/    /'
}

# 0. bounded probe: bail only after several attempts (the lease can flap —
#    one green probe followed by a hang on the next client was observed
#    2026-08-19; a single-shot probe then aborts a whole campaign window)
PROBE_OK=0
for attempt in 1 2 3 4; do
  # 480s: a healthy-but-recovering relay measured 202-386 s just to init
  # the backend (2026-08-19 r4 session) — 300 s would call it wedged
  stage "probe$attempt" 480 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
  if grep -q PROBE_OK "$OUT/probe$attempt.log"; then PROBE_OK=1; break; fi
  echo "probe attempt $attempt failed; backing off 120s"
  sleep 120
done
[ "$PROBE_OK" = 1 ] || { echo 'relay still wedged; aborting'; exit 1; }

# 1. driver bench (headline + realtime-feasibility fields)
stage bench 2700 python bench.py

# 2. per-config matrix (config 3 carries the r4 stacked-roll + alpha-skip)
stage matrix 3000 python tools/bench_matrix.py -n 30

# 3. on-chip pytest lane (compiled Mosaic kernels — record the green run)
stage tpu_lane 3000 env TPUFG_TEST_TPU=1 python -m pytest tests/ -m tpu -q

# 4. natural-corpus eval on chip (rich corpus; learned row = bundled head;
#    fb rows are the r4 adaptive MC->crossfade fallback, quality = the
#    full preset incl. fb)
stage eval_clean 3600 python tools/eval_natural.py --pairs 8 \
  --modes crossfade,pyramid,quality,quality_nofb,pyramid_fb,learned
stage eval_grain 3600 python tools/eval_natural.py --pairs 8 --grain \
  --modes crossfade,pyramid,quality,quality_nofb,pyramid_fb,learned

# 4a. multi-rate table: score EVERY in-between of an fps-multiplied stream
#     against its exact-t analytic truth (one shared MV field per pair —
#     the engine's real k>2 semantics)
stage eval_mult3 2400 python tools/eval_natural.py --pairs 6 --no-gate \
  --mult 3 --modes crossfade,pyramid,quality,learned
stage eval_mult4 2400 python tools/eval_natural.py --pairs 6 --no-gate \
  --mult 4 --modes crossfade,pyramid,quality,learned

# 4b. decoded-content check (real codec round-trip; ordering must hold)
stage eval_decoded 3600 python tools/eval_natural.py --pairs 8 --no-gate \
  --codec mp4v --modes crossfade,pyramid,quality,learned

# 4c. k=4 learned step timing (the trunk is hoisted out of the per-t
#     loop: one trunk + k-1 tails per pair — measure the multiplied rate)
stage profile_k4 1800 python tools/profile_step.py --mode learned -k 4 \
  --in-w 3840 --in-h 2160 --out-mult 1

# 5. paced DEMONSTRATION well above the r3 4-fps demo: a real-time run
#    with per-frame sync + y4m egress at a size the relay's ~31 MB/s
#    readback sustains (640x480 C420 at 48 out-fps = 22 MB/s).  The
#    runner's final line records deadlines met — demonstrated pacing,
#    not arithmetic from trace percentiles.
#
#    The rate is ADAPTIVE: paced mode syncs every frame, so its ceiling
#    is host-visible latency — which swings 28-116 ms with relay weather
#    (the r4d2 demo ran a fixed 24 fps into a 116 ms-sync day and met
#    0/238 deadlines).  A calibration stage measures the p50 host-visible
#    step at the demo shape and picks 80% of that ceiling, capped at the
#    24 fps the fixed demo used, so the artifact demonstrates SUSTAINED
#    pacing at whatever this host can actually do today.
stage paced_cal 900 python -c "
from tpufg.config import EngineConfig, resolve_sizes
from tpufg.engine.runner import measure_paced_rate
cfg = resolve_sizes(EngineConfig(
    input_width=320, input_height=240, output_width=640,
    output_height=480, target_fps=24, fps_multiplier=2))
s = measure_paced_rate(cfg)
# pacing deadlines are per INPUT frame (runner: frame_period =
# 1/target_fps), so the ceiling is 1/s steps/s
fps = max(1, min(24, int(0.8 / s)))
print(f'p50 host-visible step {s*1e3:.1f} ms -> ceiling '
      f'{1.0/s:.1f} steps/s -> demo input fps {fps}')
print(fps)"
FPS=$(tail -1 "$OUT/paced_cal.log" | tr -d '[:space:]')
case "$FPS" in ''|*[!0-9]*) FPS=4;; esac
echo "paced demo at input fps $FPS"
stage paced_demo 1200 python -m tpufg.cli synthetic:320x240 \
  --output-width 640 --output-height 480 --target-fps "$FPS" \
  --fps-multiplier 2 --frames 240 --output "$OUT/paced_demo.y4m" \
  --y4m-chroma 420
stage paced_demo_rm 60 rm -f "$OUT/paced_demo.y4m"


echo "campaign done -> $OUT"
