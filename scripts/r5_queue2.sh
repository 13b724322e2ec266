#!/bin/bash
# Round-5 TPU queue, phase 2: retry the failed sub-0.5 A/B (transient
# remote-compile drop in phase 1), re-run the tunnel floor WITHOUT
# concurrent CPU load (the phase-1 numbers were polluted by a parallel
# test-suite run and came out below the real pipeline's FPS), then the
# full 52-config sweep at the reference's scale-step-0.1 granularity.
cd /root/repo
export JAX_CACHE_DIR=/root/.cache/jax_sv
log=bench/r5_queue2.log
: > "$log"

echo "=== ab sub05_b46 retry $(date +%T) ===" >> "$log"
timeout 3000 python -m stereovision_tpu.bench.ab --mode batch --sub 1 \
  --width 2484 --height 750 --batches 4,6 \
  --out bench/ab_sub05_b46.json >> "$log" 2>&1
echo "rc=$?" >> "$log"

echo "=== tunnel_floor rerun $(date +%T) ===" >> "$log"
timeout 3600 python scripts/tunnel_floor.py >> "$log" 2>&1
echo "rc=$?" >> "$log"

echo "=== sweep 52 configs $(date +%T) ===" >> "$log"
timeout 18000 python -m stereovision_tpu.bench.sweep \
  --scales 1.0,0.5,0.6,0.7,0.8,0.9,1.1,1.2,1.3,1.4,1.5,1.6,1.7,1.8,1.9,2.0,2.1,2.2,2.3,2.4,2.5,2.6,2.7,2.8,2.9,3.0 \
  --sub 0,1 --batch-overrides "2.5:0=16" \
  --out bench/sweep_r5.csv >> "$log" 2>&1
echo "rc=$?" >> "$log"
echo "=== queue2 done $(date +%T) ===" >> "$log"
