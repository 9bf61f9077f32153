#!/bin/bash
# Round-4 chip queue item 1: image flagship with the round-4 quality levers
# (per-view scale matching + 4-level pyramid MSE + stage-level exact-gradient
# escalation).  Single-client chip: strictly serial; timeout-bounded;
# mid-stage checkpoints every 180 s make the run resumable.
set -u
cd /root/repo
echo "=== image flagship r4 start $(date) ==="
IMG_DIR=results/einstein_turing_r4 IMG_ITERS=40 IMG_RECORD=100 \
ANRT_CKPT_SECS=180 ANRT_SYNC_EVERY=4 \
  timeout ${IMG_TIMEOUT:-9900} python run_image_flagship.py \
  > results/image_flagship_r4.log 2>&1
echo "flagship exit=$? at $(date)"
sleep 150
IMG_DIR=results/einstein_turing_r4 timeout 600 python run_image_flagship.py --report-only \
  >> results/image_flagship_r4.log 2>&1
echo "report exit=$? at $(date)"
