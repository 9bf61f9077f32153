#!/bin/bash
# Round-4 chip queue part 3 (after northstar): finish what the TPU-worker
# crash cut, then the last measurements.  Serial, settle-gapped, bounded.
set -u
cd /root/repo
echo "=== [1/3] focal-stack resume #2 (129^3 stage) $(date) ==="
ANRT_CKPT_SECS=120 ANRT_EXACT_TOL=0.05 ANRT_SYNC_EVERY=2 \
timeout ${FS_TIMEOUT:-2400} \
  python -m adjointnonlinearraytracing_tpu.experiments.runner \
  configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
  --result-dir results/focalstack_256 \
  --set "res_list=[5,17,65,129]" --set "optim_iters=15" \
  --set "record_iters=30" \
  --set "resume_from=results/focalstack_256/result.npz" \
  >> results/focalstack_r4.log 2>&1
echo "focalstack exit=$? at $(date)"
sleep 150
echo "=== [2/3] probe_evalmath $(date) ==="
timeout 1500 python -m adjointnonlinearraytracing_tpu.benchmarks.probe_evalmath \
  > results/probe_evalmath.log 2>&1
echo "probe exit=$? at $(date)"
sleep 150
echo "=== [3/3] flagship report with pooled corr $(date) ==="
IMG_DIR=results/einstein_turing_r4 timeout 700 python run_image_flagship.py --report-only \
  >> results/image_flagship_r4.log 2>&1
echo "report exit=$? at $(date)"
echo "queue r4c complete at $(date)"
