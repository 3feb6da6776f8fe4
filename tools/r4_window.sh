#!/bin/bash
# Round-4 measurement window: run between training jobs (chip must be idle).
# Usage: bash tools/r4_window.sh <volsdf_ckpt> [outdir]
# 1) 5-view eval, dense + full-budget, f32 vs bf16 render_dtype (PSNR parity
#    gate for the bench's BENCH_RENDER_DTYPE=bfloat16 default)
# 2) bench A/B: render_dtype and bisect-cumsum levers on dense/ref/stress
set -eu
CKPT="$1"
OUT="${2:-/tmp/r4_window}"
mkdir -p "$OUT"
cd /root/repo

# bash array (ADVICE r4: word-splitting broke on paths with spaces)
EVAL=(python tools/eval_psnr.py --config configs/volsdf_fangzhou_nature.yaml
      --load_pt "$CKPT" --downscale 2 --views 0,20,40,60,80
      --model:sampler_dtype bfloat16)

echo "== dense f32-render ==" | tee "$OUT/eval.log"
timeout 900 "${EVAL[@]}" --model:max_upsample_iter 0 2>&1 | tail -3 | tee -a "$OUT/eval.log"
echo "== dense bf16-render ==" | tee -a "$OUT/eval.log"
timeout 900 "${EVAL[@]}" --model:max_upsample_iter 0 --model:render_dtype bfloat16 \
    2>&1 | tail -3 | tee -a "$OUT/eval.log"
echo "== full-budget f32-render ==" | tee -a "$OUT/eval.log"
timeout 900 "${EVAL[@]}" 2>&1 | tail -3 | tee -a "$OUT/eval.log"
echo "== full-budget bf16-render ==" | tee -a "$OUT/eval.log"
timeout 900 "${EVAL[@]}" --model:render_dtype bfloat16 2>&1 | tail -3 | tee -a "$OUT/eval.log"

# bench scenario A/Bs (each child self-deadlines; BENCH_ITERS small for A/B)
run_scn () {  # name scenario env...
  local name="$1"; shift
  local scn="$1"; shift
  echo "== bench $name ==" | tee -a "$OUT/bench.log"
  env BENCH_INNER=1 BENCH_SCENARIO="$scn" BENCH_ITERS=3 \
      BENCH_CHILD_DEADLINE_SEC=240 "$@" timeout 300 python bench.py \
      2>/dev/null | tail -1 | tee -a "$OUT/bench.log"
}

: > "$OUT/bench.log"
run_scn dense-f32rd        dense  BENCH_RENDER_DTYPE=float32
run_scn dense-bf16rd       dense  BENCH_RENDER_DTYPE=bfloat16
run_scn ref-f32rd          converged BENCH_RENDER_DTYPE=float32
run_scn ref-bf16rd         converged BENCH_RENDER_DTYPE=bfloat16
run_scn ref-bf16rd-mmcs    converged BENCH_RENDER_DTYPE=bfloat16 NERFART_BISECT_CUMSUM=matmul
run_scn stress-f32rd       stress BENCH_RENDER_DTYPE=float32
run_scn stress-bf16rd      stress BENCH_RENDER_DTYPE=bfloat16
run_scn stress-bf16rd-mmcs stress BENCH_RENDER_DTYPE=bfloat16 NERFART_BISECT_CUMSUM=matmul
run_scn stress-mmcs-only   stress BENCH_RENDER_DTYPE=float32 NERFART_BISECT_CUMSUM=matmul
# chunk sweep at bf16 (activation footprint halves -> optimum may move up)
run_scn dense-bf16-c2160   dense  BENCH_RENDER_DTYPE=bfloat16 BENCH_RAYS_CHUNK=2160
run_scn dense-bf16-c4320   dense  BENCH_RENDER_DTYPE=bfloat16 BENCH_RAYS_CHUNK=4320
run_scn ref-bf16-mmcs-c2160 converged BENCH_RENDER_DTYPE=bfloat16 NERFART_BISECT_CUMSUM=matmul BENCH_RAYS_CHUNK=2160
echo "window done -> $OUT"
