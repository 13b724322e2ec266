#!/bin/bash
# Re-measure the sub-1.0x rows of bench/sweep_r5.csv, one FRESH PROCESS
# per config (a TPU worker fault kills the jax client for good; fresh
# processes bound the blast radius to one config — see
# r5_sweep_driver.sh).  Appends rows to bench/sweep_r5_runs.csv; the
# canonical sweep_r5.csv is rebuilt afterwards as each config's best
# window-median across all runs (scripts/rebuild_sweep_csv.py).
#
# Batch overrides pin the fault-workaround batches the committed rows
# used (591x178 faults at policy batch; 2.5:0=16 per the r5 A/B).
cd /root/repo
export JAX_CACHE_DIR=/root/.cache/jax_sv
master=bench/sweep_r5_runs.csv
log=bench/r5_requeue.log
# 591x178 faults at policy batches (32 full / 16 sub); batch 12 is the
# largest stable sub batch there and clears CUDA where batch 8 lost
# ~30% throughput (bench/sweep_r5_runs.csv, docs/KNOWN_ISSUES.md)
OVR="2.5:0=16,2.1:0=16,2.1:1=12"

run_one() {  # scale sub
  tmp=bench/.tmp_requeue_$1_$2.csv
  rm -f "$tmp"
  echo "=== scale $1 sub $2 $(date +%T) ===" >> "$log"
  timeout 1500 python -m stereovision_tpu.bench.sweep \
    --scales "$1" --sub "$2" --batch-overrides "$OVR" \
    --out "$tmp" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
  if [ -f "$tmp" ] && [ "$(wc -l < "$tmp")" -ge 2 ]; then
    tail -n +2 "$tmp" >> "$master"
  fi
  rm -f "$tmp"
}

for pass in 1 2; do
  run_one 1.0 1
  run_one 1.3 1
  run_one 1.4 0
  run_one 1.4 1
  run_one 1.8 1
  run_one 1.9 1
  run_one 2.1 0
  run_one 2.1 1
  run_one 2.5 1
  run_one 2.6 1
  run_one 2.9 0
  run_one 3.0 0
  run_one 3.0 1
  run_one 0.5 1
done
echo "=== requeue done $(date +%T) ===" >> "$log"
