#!/bin/bash
# Round-3 session-B chip queue: image flagship -> fiber ladder v2 -> focal
# stack at reference scale.  Single-client chip: strictly serial, >=150 s
# settle between processes, every item timeout-bounded, and a global
# deadline so the chip is free for the driver's end-of-round bench.
set -u
cd /root/repo
START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE:-3200}   # seconds of chip time this queue may use

left() { echo $(( DEADLINE - ($(date +%s) - START) )); }

echo "=== [1/3] image flagship (trimmed ladder, resumable) at $(date) ==="
IMG_RES_LIST=5,17,65,129 IMG_ITERS=35 IMG_RECORD=100 \
  timeout 1750 python run_image_flagship.py --resume \
  > results/image_flagship.log 2>&1
rc=$?
echo "image exit=$rc at $(date), left=$(left)s"
if [ ! -f results/einstein_turing_128/report.json ] && [ "$(left)" -gt 700 ]; then
  sleep 150
  echo "=== [1b] image report from checkpoint ==="
  timeout 500 python run_image_flagship.py --report-only \
    >> results/image_flagship.log 2>&1
  echo "report-only exit=$? at $(date)"
fi

if [ "$(left)" -gt 1100 ]; then
  sleep 150
  echo "=== [2/3] fiber ladder v2 (trimmed refine) at $(date) ==="
  FIBER_ITERS=30 FIBER_REFINE="2e-3:200:2,5e-4:200:4,1e-4:200:4" \
    timeout $(( $(left) > 1400 ? 1250 : $(left) - 150 )) \
    python run_fiber_ladder.py > results/fiber_ladder_v2.log 2>&1
  echo "fiber exit=$? at $(date), left=$(left)s"
else
  echo "SKIP fiber: only $(left)s left"
fi

if [ "$(left)" -gt 800 ]; then
  sleep 150
  echo "=== [3/3] focal stack 256^2 x 20 spp at $(date) ==="
  timeout $(( $(left) - 100 )) \
    python -m adjointnonlinearraytracing_tpu.experiments.runner \
    configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
    --result-dir results/focalstack_256 \
    --set "res_list=[9,33,65]" --set "optim_iters=5" \
    > results/focalstack_256.log 2>&1
  echo "focalstack exit=$? at $(date)"
else
  echo "SKIP focalstack: only $(left)s left"
fi
echo "queue complete at $(date)"
