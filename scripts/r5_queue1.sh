#!/bin/bash
# Round-5 TPU measurement queue, phase 1 (one job at a time — the chip
# is reached through a single tunnel; see CLAUDE.md).
#   1. tunnel-floor microbenchmark (empty-pipeline FPS at tiny shapes)
#   2. interleaved batch A/Bs on the r4 losing sweep rows
cd /root/repo
export JAX_CACHE_DIR=/root/.cache/jax_sv
log=bench/r5_queue1.log
: > "$log"

echo "=== tunnel_floor $(date +%T) ===" >> "$log"
timeout 3600 python scripts/tunnel_floor.py >> "$log" 2>&1
echo "rc=$?" >> "$log"

ab () {
  name=$1; shift
  echo "=== ab $name $(date +%T) ===" >> "$log"
  timeout 2700 python -m stereovision_tpu.bench.ab "$@" \
    --out "bench/ab_${name}.json" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
}

# wide subsampled rows: batch 6 now that the banded CCL bounds VMEM
ab sub05_b46 --mode batch --sub 1 --width 2484 --height 750 --batches 4,6
ab sub06_b46 --mode batch --sub 1 --width 2070 --height 625 --batches 4,6
# near-parity rows: is the area-scaled batch leaving throughput on the table?
ab sub15_b916 --mode batch --sub 1 --width 828 --height 250 --batches 9,16
ab sub20_b1632 --mode batch --sub 1 --width 621 --height 187 --batches 16,32
ab full25_b3216 --mode batch --sub 0 --width 496 --height 150 --batches 32,16
echo "=== queue1 done $(date +%T) ===" >> "$log"
