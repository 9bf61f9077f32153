#!/bin/bash
# Round-4 chip queue part 2 (run after the image flagship finishes):
#   1. probe_bandscatter — dense-ops scatter replacement measurements
#   2. focal-stack resume: finish the 65/129 stages of the r3 ladder
#   3. north-star 129^3 stage rerun, lr un-starved (2.5e-5 vs 6.25e-6)
# Single-client chip: serial, >=150 s settle, all timeout-bounded.
set -u
cd /root/repo
START=$(date +%s)
DEADLINE=${QUEUE_DEADLINE:-11400}
left() { echo $(( DEADLINE - ($(date +%s) - START) )); }

echo "=== [1/3] probe_bandscatter $(date) ==="
timeout 1500 python -m adjointnonlinearraytracing_tpu.benchmarks.probe_bandscatter \
  > results/probe_bandscatter.log 2>&1
echo "probe exit=$? at $(date), left=$(left)s"
sleep 150

echo "=== [1b] single-view image control $(date) ==="
ANRT_CKPT_SECS=180 timeout 2400 python run_image_singleview.py \
  > results/image_singleview_r4.log 2>&1
echo "singleview exit=$? at $(date), left=$(left)s"
sleep 150

echo "=== [2/3] focal-stack resume 65/129 $(date) ==="
ANRT_CKPT_SECS=120 ANRT_EXACT_TOL=0.05 ANRT_SYNC_EVERY=2 \
timeout $(( $(left) - 6600 > 900 ? $(left) - 6600 : 900 )) \
  python -m adjointnonlinearraytracing_tpu.experiments.runner \
  configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
  --result-dir results/focalstack_256 \
  --set "res_list=[5,17,65,129]" --set "optim_iters=15" \
  --set "record_iters=30" \
  --set "resume_from=results/focalstack_256/result.npz" \
  > results/focalstack_r4.log 2>&1
echo "focalstack exit=$? at $(date), left=$(left)s"
sleep 150

echo "=== [3/3] north-star 129^3 lr-floor stage $(date) ==="
NS_DIR=results/fuel_northstar_r4 NS_INIT=results/fuel_northstar/eta_65.npy \
NS_STAGES="129:36:16" NS_LR=2.5e-5 NS_ERR_EVERY=6 ANRT_CKPT_SECS=300 \
timeout $(( $(left) - 120 > 900 ? $(left) - 120 : 900 )) \
  python run_fuel_northstar.py > results/fuel_northstar_r4.log 2>&1
echo "northstar exit=$? at $(date)"
echo "queue r4b complete at $(date)"
