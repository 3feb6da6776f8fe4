#!/bin/bash
# Round-5 recovery window: the chip items still open after the backend
# outage (PERF.md round-5 outage note), in value order so an early
# re-wedge costs the least. Run ONLY after a materializing probe
# succeeds. NO stage wraps device work in an external `timeout`: a
# SIGTERM/SIGKILL mid-device-work wedges the remote PJRT server for
# ~35 min (bench.py _run_child docstring). Every stage bounds itself —
# bench.py children self-deadline, train.py uses training.max_wall_sec,
# and the render jobs are minutes-scale with a warm compile cache.
#   1. dense-frame profiler trace (VERDICT r4 item 6)
#   2. driver-bench rehearsal, cold then warm cache (item 2)
#   3. UNISURF from-scratch convergence run (item 5c) — longest, last
# Usage: bash tools/r5c_window.sh [outdir]
set -eu
OUT="${1:-/tmp/r5c_window}"
mkdir -p "$OUT"
cd /root/repo

echo "== 0. probe ==" | tee "$OUT/window.log"
python -c "
import jax, jax.numpy as jnp, numpy as np
y = jax.jit(lambda a: a@a)(jnp.ones((256,256)))
print('PROBE_OK', float(np.asarray(y)[0,0]))" 2>&1 | tail -1 \
    | tee -a "$OUT/window.log"
grep -q PROBE_OK "$OUT/window.log" || { echo "backend down"; exit 2; }

echo "== 1. dense-frame profile ==" | tee -a "$OUT/window.log"
python -u tools/profile_render.py \
    --ckpt pretrained/volsdf_fangzhou_r4.npz --scenario dense \
    --outdir "$OUT/trace_dense" 2>&1 | tail -8 | tee -a "$OUT/window.log"

echo "== 2. driver-bench rehearsal (cold cache) ==" | tee -a "$OUT/window.log"
rm -rf /tmp/r5_cold_cache
env JAX_COMPILATION_CACHE_DIR=/tmp/r5_cold_cache \
    python bench.py 2>"$OUT/bench_cold.err" | tail -1 \
    | tee "$OUT/bench_cold.json"
echo "== 2b. driver-bench rehearsal (warm repo cache) ==" \
    | tee -a "$OUT/window.log"
python bench.py 2>"$OUT/bench_warm.err" | tail -1 \
    | tee "$OUT/bench_warm.json"

echo "== 3. UNISURF from-scratch window ==" | tee -a "$OUT/window.log"
python train.py --config configs/unisurf_fangzhou_r5.yaml \
    --training:max_wall_sec 7800 \
    2>&1 | tail -6 | tee -a "$OUT/window.log"

echo "== 4. UNISURF 5-view eval ==" | tee -a "$OUT/window.log"
CKPT="$(ls -t logs/unisurf_fangzhou_r5/ckpts/*.npz | head -1)"
python tools/eval_psnr.py \
    --config configs/unisurf_fangzhou_r5.yaml \
    --load_pt "$CKPT" \
    --downscale 2 --views 0,20,40,60,80 \
    --dump_dir "$OUT/unisurf_frames" 2>&1 | tail -8 \
    | tee -a "$OUT/window.log"
echo "window done -> $OUT"
