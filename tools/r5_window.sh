#!/bin/bash
# Round-5 measurement window (chip must be idle — run between training
# jobs). Sequence matches VERDICT r4 "next round" items:
#   1. NeuS 5-view eval on the r5 continuation checkpoint (item 1)
#   2. the literal 90-view headline protocol at r4 levers (item 3)
#   3. UNISURF 5-view eval on the r5 full-width checkpoint (item 5c)
#   4. VolSDF iter-usage measurement (empirical MFU basis, weak-7)
#   5. dense-frame profiler trace (item 6)
#   6. driver-bench rehearsal: cold + warm cache (item 2)
# Usage: bash tools/r5_window.sh <neus_ckpt> <unisurf_ckpt> [outdir]
set -eu
NEUS_CKPT="$1"
UNI_CKPT="${2:-}"
OUT="${3:-/tmp/r5_window}"
mkdir -p "$OUT"
cd /root/repo

VOLSDF_CKPT=pretrained/volsdf_fangzhou_r4.npz

echo "== 1. NeuS 5-view eval (480x270) ==" | tee "$OUT/window.log"
timeout 1200 python tools/eval_psnr.py \
    --config configs/neus_fangzhou_r5.yaml --load_pt "$NEUS_CKPT" \
    --downscale 2 --views 0,20,40,60,80 --model:sampler_dtype bfloat16 \
    --dump_dir "$OUT/neus_frames" 2>&1 | tail -8 | tee -a "$OUT/window.log"

echo "== 2. 90-view headline protocol (dense bf16 chunk 4320) ==" \
    | tee -a "$OUT/window.log"
timeout 2400 python render.py --config configs/volsdf_fangzhou_nature.yaml \
    --load_pt "$VOLSDF_CKPT" --num_views 90 --downscale 2 \
    --model:max_upsample_iter 0 --model:render_dtype bfloat16 \
    --model:sampler_dtype bfloat16 --rayschunk 4320 \
    --outbase out/r5_headline 2>&1 | tail -95 | tee -a "$OUT/window.log"

if [ -n "$UNI_CKPT" ]; then
  echo "== 3. UNISURF 5-view eval ==" | tee -a "$OUT/window.log"
  timeout 1200 python tools/eval_psnr.py \
      --config configs/unisurf_fangzhou_r4.yaml --load_pt "$UNI_CKPT" \
      --downscale 4 --views 0,20,40,60,80 \
      --dump_dir "$OUT/unisurf_frames" 2>&1 | tail -8 \
      | tee -a "$OUT/window.log"
fi

echo "== 4. VolSDF iter-usage (empirical MFU basis) ==" \
    | tee -a "$OUT/window.log"
timeout 1200 python tools/eval_psnr.py \
    --config configs/volsdf_fangzhou_nature.yaml --load_pt "$VOLSDF_CKPT" \
    --downscale 2 --views 0,40,80 --rayschunk 1080 \
    --model:sampler_dtype bfloat16 --dump_iter_usage 2>&1 | tail -5 \
    | tee -a "$OUT/window.log"

echo "== 5. dense-frame profile ==" | tee -a "$OUT/window.log"
timeout 1200 python tools/profile_render.py \
    --ckpt "$VOLSDF_CKPT" --scenario dense --outdir "$OUT/trace_dense" \
    2>&1 | tail -12 | tee -a "$OUT/window.log"

echo "== 6. driver-bench rehearsal (cold cache) ==" | tee -a "$OUT/window.log"
rm -rf /tmp/r5_cold_cache
env JAX_COMPILATION_CACHE_DIR=/tmp/r5_cold_cache timeout 1300 \
    python bench.py 2>/dev/null | tail -1 | tee -a "$OUT/bench_cold.json"
echo "== 6b. driver-bench rehearsal (warm repo cache) ==" \
    | tee -a "$OUT/window.log"
timeout 1300 python bench.py 2>/dev/null | tail -1 \
    | tee -a "$OUT/bench_warm.json"
echo "window done -> $OUT"
