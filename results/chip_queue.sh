#!/bin/bash
# Round-3 chip task queue: waits for the north-star run (pid $1) to finish,
# then serially drives the remaining on-chip measurements (single-client
# chip: never overlap).  Each item is timeout-bounded so a hang cannot eat
# the rest of the queue.
set -u
NS_PID=${1:?usage: chip_queue.sh <northstar_pid>}
cd /root/repo

echo "waiting for north star (pid $NS_PID) ..."
while kill -0 "$NS_PID" 2>/dev/null; do sleep 30; done
echo "north star done at $(date)"
sleep 10

echo "=== [1/3] row-DMA gather probe ==="
timeout 900 python -m adjointnonlinearraytracing_tpu.benchmarks.probe_dma_gather \
  > results/probe_dma_gather.log 2>&1
echo "probe exit=$? at $(date)"

echo "=== [2/3] resolution sweep incl. 257^3 ==="
timeout 2700 python -m adjointnonlinearraytracing_tpu.benchmarks.sweeps \
  resolution 3,5,9,17,33,65,129,257 \
  > results/sweep_resolution_257.jsonl 2>&1
echo "sweep exit=$? at $(date)"

echo "=== [3/3] compaction bench ==="
timeout 1500 python -m adjointnonlinearraytracing_tpu.benchmarks.compaction_bench \
  > results/compaction_bench.log 2>&1
echo "compaction exit=$? at $(date)"

# optional item 4: reference-scale focal stack; only if the marker exists
if [ -f results/RUN_FS ]; then
  echo "=== [4] focal stack 256^2 x 20 spp ladder to 65^3 ==="
  timeout 3600 python -m adjointnonlinearraytracing_tpu.experiments.runner \
    configs/params-focalstack.yaml lkfs10_3im_srciminfocus_cone1_dist2 \
    --result-dir results/focalstack_256 \
    --set "res_list=[5,9,17,33,65]" \
    > results/focalstack_256.log 2>&1
  echo "focalstack exit=$? at $(date)"
fi
echo "queue complete at $(date)"
