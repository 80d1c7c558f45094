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

# 0. bounded probe: bail early if the lease is still wedged
stage probe 300 python -c "
import jax, jax.numpy as jnp
print('devices', jax.devices())
print('PROBE_OK', float(jnp.ones((8,128)).sum()))"
grep -q PROBE_OK "$OUT/probe.log" || { echo 'relay still wedged; aborting'; exit 1; }

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
stage eval_v2 1800 python tools/eval_natural.py --pairs 8 --no-gate \
  --model-path checkpoints/head64_v2.npz --modes learned
stage eval_v2_grain 1800 python tools/eval_natural.py --pairs 8 --grain \
  --no-gate --model-path checkpoints/head64_v2.npz --modes learned

# 4b. decoded-content check (real codec round-trip; ordering must hold)
stage eval_decoded 3600 python tools/eval_natural.py --pairs 8 --no-gate \
  --codec mp4v --modes crossfade,pyramid,quality,learned

# 5. sites-kernel dx_chunk retry (the r3 compile-helper blocker):
#    chunk 11 and 33 at the shipping tile on a 1088p-class frame
stage dx_retry 2400 python - <<'EOF'
import time
import numpy as np
import jax.numpy as jnp
from tpufg.kernels.motion import motion_search_sites, sites_tile_w
rng = np.random.default_rng(0)
prev = jnp.asarray(rng.random((4, 1088, 1920)).astype(np.float32))
curr = jnp.asarray(np.roll(np.asarray(prev), (3, -2), (1, 2)))
ref = None
for chunk in (3, 11, 33):
    try:
        t0 = time.perf_counter()
        out = motion_search_sites(prev, curr, search_radius=16,
                                  tile_w=sites_tile_w(16), dx_chunk=chunk)
        _ = np.asarray(out[0:1, 0:1, 0:1]); compile_s = time.perf_counter() - t0
        t0 = time.perf_counter(); n = 10
        for _ in range(n):
            out = motion_search_sites(prev, curr, search_radius=16,
                                      tile_w=sites_tile_w(16), dx_chunk=chunk)
        _ = np.asarray(out[0:1, 0:1, 0:1])
        ms = (time.perf_counter() - t0) / n * 1e3
        full = np.asarray(out)
        ok = "?" if ref is None else ("bitwise" if (full == ref).all() else "MISMATCH")
        if ref is None: ref = full
        print(f"dx_chunk {chunk}: {ms:.1f} ms (compile {compile_s:.0f}s) {ok}", flush=True)
    except Exception as e:
        print(f"dx_chunk {chunk}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
EOF

echo "campaign done -> $OUT"
