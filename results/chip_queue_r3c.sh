#!/bin/bash
# Round-3 session-C chip queue: focal stack at reference ray scale
# (256^2 bins x 20 spp x 3 stacks ~= 1.3M rays/iter — VERDICT r2 item 5),
# then image-flagship resume with whatever chip time remains.
# Single-client chip: strictly serial, >=150 s settle between processes,
# every item timeout-bounded, global deadline so the chip is free for the
# end-of-round bench.
set -u
cd /root/repo
START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE:-2700}   # seconds of chip time this queue may use

left() { echo $(( DEADLINE - ($(date +%s) - START) )); }

echo "=== [1/2] focal stack 256^2 x 20spp x 3 stacks at $(date) ==="
timeout $(( $(left) - 900 > 600 ? $(left) - 900 : 600 )) \
  python -m adjointnonlinearraytracing_tpu.experiments.runner \
  configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
  --result-dir results/focalstack_256 \
  --set "res_list=[5,17,65,129]" --set "optim_iters=15" \
  --set "record_iters=15" \
  > results/focalstack_256.log 2>&1
echo "focalstack exit=$? at $(date), left=$(left)s"

if [ "$(left)" -gt 700 ]; then
  sleep 150
  echo "=== [2/2] image flagship resume at $(date) ==="
  IMG_RES_LIST=129 IMG_ITERS=200 IMG_RECORD=100 \
    timeout $(( $(left) - 60 )) python run_image_flagship.py --resume \
    > results/image_flagship_r3c.log 2>&1
  echo "image exit=$? at $(date)"
  sleep 150
  timeout 400 python run_image_flagship.py --report-only \
    >> results/image_flagship_r3c.log 2>&1
  echo "report exit=$? at $(date)"
else
  echo "SKIP image: only $(left)s left"
fi
echo "queue complete at $(date)"
