#!/bin/bash
# Per-scale sweep driver: one FRESH PROCESS per scale.  The axon TPU
# worker crashes occasionally and the jax client in the crashed-against
# process never reconnects — a single-process 52-row sweep therefore
# dies wholesale at the first crash (bench/r5_queue3.log: rows 13-52
# all UNAVAILABLE after one worker fault).  A fresh process per scale
# gets a fresh client, so one fault costs at most one scale, and the
# scale is retried once.
#
# Usage: r5_sweep_driver.sh <master_csv> <scale> [scale...]
cd /root/repo
export JAX_CACHE_DIR=/root/.cache/jax_sv
master=$1; shift
log=bench/r5_sweep_driver.log

for s in "$@"; do
  for attempt in 1 2; do
    tmp=bench/.tmp_sweep_${s}.csv
    rm -f "$tmp"
    echo "=== scale $s attempt $attempt $(date +%T) ===" >> "$log"
    timeout 2400 python -m stereovision_tpu.bench.sweep \
      --scales "$s" --sub 0,1 --batch-overrides "2.5:0=16" \
      --out "$tmp" >> "$log" 2>&1
    echo "rc=$?" >> "$log"
    if [ -f "$tmp" ] && [ "$(wc -l < "$tmp")" -ge 3 ]; then
      tail -n +2 "$tmp" >> "$master"
      rm -f "$tmp"
      break
    fi
    # partial (1 row) on the last attempt: keep what we got
    if [ "$attempt" = 2 ] && [ -f "$tmp" ]; then
      tail -n +2 "$tmp" >> "$master"
      rm -f "$tmp"
    fi
  done
done
echo "=== driver done $(date +%T) ===" >> "$log"
