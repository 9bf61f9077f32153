#!/bin/bash
# Round-5 chip queue part 3 (after r5b): ds-speed probe on the bench scene,
# then a final official-bench sanity run.  Serial, settle-gapped, bounded.
set -u
cd /root/repo
while ! grep -q "queue r5b complete" results/chip_queue_r5b.log 2>/dev/null; do
  sleep 60
done
sleep 180

echo "=== [1/2] ds-speed probe (bench scene) $(date) ==="
timeout 2400 python -m adjointnonlinearraytracing_tpu.benchmarks.probe_ds_speed \
  > results/probe_ds_speed.log 2>&1
echo "probe exit=$? at $(date)"
sleep 150

echo "=== [2/2] official bench sanity $(date) ==="
timeout 1200 python bench.py > results/bench_r5_sanity.log 2>&1
echo "bench exit=$? at $(date)"
echo "queue r5c complete at $(date)"
