#!/bin/bash
set -u
cd /root/repo
echo "=== [1/2] flagship pooled report, longer timeout $(date) ==="
IMG_DIR=results/einstein_turing_r4 timeout 1500 python run_image_flagship.py --report-only \
  >> results/image_flagship_r4.log 2>&1
echo "report exit=$? at $(date)"
sleep 150
echo "=== [2/2] focal-stack resume #3 (129^3 stage) $(date) ==="
ANRT_CKPT_SECS=120 ANRT_EXACT_TOL=0.05 ANRT_SYNC_EVERY=2 \
timeout ${FS_TIMEOUT:-3300} \
  python -m adjointnonlinearraytracing_tpu.experiments.runner \
  configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
  --result-dir results/focalstack_256 \
  --set "res_list=[5,17,65,129]" --set "optim_iters=15" \
  --set "record_iters=30" --set "grad_spotcheck=false" \
  --set "resume_from=results/focalstack_256/result.npz" \
  >> results/focalstack_r4.log 2>&1
echo "focalstack exit=$? at $(date)"
echo "queue r4d complete at $(date)"
