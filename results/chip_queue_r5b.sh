#!/bin/bash
# Round-5 chip queue part 2 (after r5a): fuel-injection step-size +
# compaction levers (VERDICT r4 #2), then the TV-regularized north-star
# control stage (VERDICT r4 #6).  Serial, settle-gapped, bounded.
set -u
cd /root/repo
# wait for queue r5a (focal-stack) to finish, then settle
while ! grep -q "queue r5a complete" results/chip_queue_r5a.log 2>/dev/null; do
  sleep 60
done
sleep 180

echo "=== [1/3] fuel 129^3 A: ds=h/2 + auto-compaction (8 iters) $(date) ==="
NS_DIR=results/fuel_ds_r5a NS_INIT=results/fuel_northstar/eta_65.npy \
NS_STAGES="129:8:16" NS_LR=6.25e-6 NS_ERR_EVERY=4 \
timeout 2400 python run_fuel_northstar.py > results/fuel_ds_r5a.log 2>&1
echo "A exit=$? at $(date)"
sleep 150

echo "=== [2/3] fuel 129^3 B: ds=0.995h + compaction (8 iters) $(date) ==="
NS_DIR=results/fuel_ds_r5b NS_INIT=results/fuel_northstar/eta_65.npy \
NS_STAGES="129:8:16" NS_LR=6.25e-6 NS_ERR_EVERY=4 \
NS_DS_ALPHA=0.995 ANRT_NMAX=1.001 \
timeout 2000 python run_fuel_northstar.py > results/fuel_ds_r5b.log 2>&1
echo "B exit=$? at $(date)"
sleep 150

echo "=== [3/3] TV-regularized 129^3 stage (48 iters, ds=h/2) $(date) ==="
NS_DIR=results/fuel_tv_r5 NS_INIT=results/fuel_northstar/eta_65.npy \
NS_STAGES="129:48:16" NS_LR=6.25e-6 NS_ERR_EVERY=6 NS_TV=0.3 \
timeout 8000 python run_fuel_northstar.py > results/fuel_tv_r5.log 2>&1
echo "TV exit=$? at $(date)"
echo "queue r5b complete at $(date)"
