#!/bin/bash
# Session-B manual sequencer (replaces the tail of chip_queue_r3b.sh):
# wait for the image flagship python (pid $1), then report-fallback and a
# time-boxed focal-stack run, keeping the chip FREE after HARD_STOP so the
# round driver's bench cannot collide with a held chip session.
set -u
IMG_PID=${1:?usage: chip_watch_r3b.sh <image_pid> <hard_stop_epoch>}
HARD_STOP=${2:?}
cd /root/repo

left() { echo $(( HARD_STOP - $(date +%s) )); }

while kill -0 "$IMG_PID" 2>/dev/null; do sleep 15; done
echo "image python exited at $(date), left=$(left)s"

if [ ! -f results/einstein_turing_128/report.json ] && [ "$(left)" -gt 500 ]; then
  sleep 150
  echo "=== report-only from checkpoint at $(date) ==="
  timeout $(( $(left) - 60 > 500 ? 500 : $(left) - 60 )) \
    python run_image_flagship.py --report-only \
    >> results/image_flagship.log 2>&1
  echo "report-only exit=$? at $(date), left=$(left)s"
fi

if [ "$(left)" -gt 400 ]; then
  sleep 150
  echo "=== focal stack 256^2 x 20 spp (time-boxed; partial run still logs"
  echo "    per-iteration MSE + rays/s) at $(date) ==="
  timeout $(( $(left) - 30 )) \
    python -m adjointnonlinearraytracing_tpu.experiments.runner \
    configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
    --result-dir results/focalstack_256 \
    --set "res_list=[9,33,65]" --set "optim_iters=6" \
    > results/focalstack_256.log 2>&1
  echo "focalstack exit=$? at $(date)"
else
  echo "SKIP focalstack: only $(left)s left"
fi
echo "watcher done at $(date); chip free"
