#!/bin/bash
# Round-2 stop-window runbook (run AFTER stopping training with
# kill -INT $(cat /tmp/train.pid); each phase prints to its own log).
# Usage: bash tools/round2_shipit.sh [ckpt]
set -x
CKPT=${1:-logs/volsdf_fangzhou_r2/ckpts/latest.npz}

# 1. freeze + ship the final checkpoint
cp "$CKPT" pretrained/volsdf_fangzhou_r2.npz

# 2. uncontended headline bench (defaults now load the shipped ckpt)
timeout 1800 python bench.py 2>/tmp/ship_bench.err | tee /tmp/ship_bench.json

# 3. throughput sweep on the trained ckpt (chunk sizes + wavefront)
timeout 1500 python tools/perf_sweep.py \
  --ckpt pretrained/volsdf_fangzhou_r2.npz --iters 2 \
  --chunks 1080,2160,4320 --wavefront 2>&1 | tail -16 | tee /tmp/ship_sweep.log

# 4. PSNR/SSIM eval at the quality protocol resolution (ds2)
timeout 1500 python tools/eval_psnr.py \
  --config configs/volsdf_fangzhou_nature.yaml \
  --load_pt pretrained/volsdf_fangzhou_r2.npz \
  --downscale 2 --views 0,20,40,60,80 \
  --dump_dir pretrained/fangzhou_r2_frames 2>&1 | tail -8 | tee /tmp/ship_eval.log

# 5. the reference's headline protocol: 90 spiral views at 480x270
timeout 2400 python render.py --config configs/volsdf_fangzhou_nature.yaml \
  --load_pt pretrained/volsdf_fangzhou_r2.npz \
  --num_views 90 --downscale 2 --rayschunk 4320 --exp_name fangzhou_r2_90v \
  2>&1 | tail -6 | tee /tmp/ship_90v.log
