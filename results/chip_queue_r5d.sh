#!/bin/bash
# Round-5 chip queue part 4 (after r5c): resume the focal-stack 129^3
# exact-gradient stage (hung client killed at step ~253, checkpoint saved)
# and run it toward a flat loss tail.  One patient client, bounded.
set -u
cd /root/repo
while ! grep -q "queue r5c complete" results/chip_queue_r5c.log 2>/dev/null; do
  sleep 60
done
sleep 180

echo "=== focal-stack 129^3 resume #2 (exact gradient) $(date) ==="
ANRT_CKPT_SECS=120 ANRT_SYNC_EVERY=2 \
timeout ${FS_TIMEOUT:-5400} \
  python -m adjointnonlinearraytracing_tpu.experiments.runner \
  configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
  --result-dir results/focalstack_256 \
  --set "res_list=[5,17,65,129]" --set "optim_iters=25" \
  --set "record_iters=1000000000" \
  --set "resume_from=results/focalstack_256/result.npz" \
  >> results/focalstack_r5.log 2>&1
echo "focalstack resume exit=$? at $(date)"
echo "queue r5d complete at $(date)"
