#!/bin/bash
# Round-5 chip queue (session 2): the committed focal-stack checkpoint is
# the r4 state (step 210) — the earlier r5 resume attempt left no surviving
# progress — so [1] resumes the 129^3 stage on the (auto-escalated) exact
# gradient; [2] is the TV-regularized north-star control stage at the
# validated ds=0.995h operating point; [3] is the ds-speed probe on the
# bench scene, best-effort if the clock allows.  Serial, settle-gapped,
# bounded; one patient client at a time (ROADMAP env notes).
set -u
cd /root/repo

echo "=== [1/3] focal-stack 129^3 resume on exact gradient $(date) ==="
ANRT_CKPT_SECS=120 ANRT_SYNC_EVERY=2 \
timeout 4200 \
  python -m adjointnonlinearraytracing_tpu.experiments.runner \
  configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
  --result-dir results/focalstack_256 \
  --set "res_list=[5,17,65,129]" --set "optim_iters=16" \
  --set "record_iters=1000000000" \
  --set "resume_from=results/focalstack_256/result.npz" \
  > results/focalstack_r5.log 2>&1
echo "focalstack exit=$? at $(date)"
sleep 180

echo "=== [2/3] TV-regularized 129^3 north-star stage $(date) ==="
NS_DIR=results/fuel_tv_r5 NS_INIT=results/fuel_northstar/eta_65.npy \
NS_STAGES="129:40:16" NS_LR=6.25e-6 NS_ERR_EVERY=4 NS_TV=0.3 \
NS_DS_ALPHA=0.995 ANRT_NMAX=1.001 \
timeout 4500 python run_fuel_northstar.py > results/fuel_tv_r5.log 2>&1
echo "TV exit=$? at $(date)"
sleep 180

# only start the probe if there is comfortably time before round end
if [ "$(date +%H%M)" -lt 1405 ]; then
  echo "=== [3/3] ds-speed probe (bench scene) $(date) ==="
  timeout 1500 python -m adjointnonlinearraytracing_tpu.benchmarks.probe_ds_speed \
    > results/probe_ds_speed.log 2>&1
  echo "probe exit=$? at $(date)"
else
  echo "skipping ds probe: too close to round end"
fi
echo "queue r5e complete at $(date)"
