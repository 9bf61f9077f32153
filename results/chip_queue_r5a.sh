#!/bin/bash
# Round-5 chip queue part 1: validate the microbatched exact path at the
# r4 crash scale, then resume the focal-stack 129^3 stage on the exact
# gradient to convergence (VERDICT r4 #1).  Serial, settle-gapped, bounded.
set -u
cd /root/repo
echo "=== [1/2] exact-envelope probe (r4 crash scale) $(date) ==="
timeout 1800 python -m adjointnonlinearraytracing_tpu.benchmarks.probe_exact_envelope \
  > results/probe_exact_envelope.log 2>&1
echo "probe exit=$? at $(date)"
sleep 150
echo "=== [2/2] focal-stack 129^3 resume on exact gradient $(date) ==="
ANRT_CKPT_SECS=120 ANRT_SYNC_EVERY=2 \
timeout ${FS_TIMEOUT:-7200} \
  python -m adjointnonlinearraytracing_tpu.experiments.runner \
  configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
  --result-dir results/focalstack_256 \
  --set "res_list=[5,17,65,129]" --set "optim_iters=40" \
  --set "record_iters=30" \
  --set "resume_from=results/focalstack_256/result.npz" \
  >> results/focalstack_r5.log 2>&1
echo "focalstack exit=$? at $(date)"
echo "queue r5a complete at $(date)"
