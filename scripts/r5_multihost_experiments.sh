#!/bin/bash
# Round-5 CPU experiment queue: close the 2-process KITTI-size
# weak-scaling instrumentation debt (VERDICT r4 next #6) and commit a
# mid-size Pallas-sharded multihost row (#7).  CPU-only (Gloo over
# localhost, forced host devices) but CPU-HEAVY — run only while no TPU
# measurement is in flight on this 2-core box.
cd /root/repo
log=bench/r5_multihost.log
: > "$log"
run () {
  name=$1; shift
  echo "=== $name $(date +%T) ===" >> "$log"
  timeout 2400 python scripts/multihost_launch.py "$@" >> "$log" 2>&1
  echo "rc=$?" >> "$log"
}

K="--width 1242 --height 375 --disp-max 255 --no-validate --pin --steps 3"

# per-stage timings: where does the 2-proc step lose time vs 1-proc?
run n1_stages --nproc 1 --local-devices 2 $K --stage-timings \
  --out bench/multihost_kitti_n1_stages.json
run n2_stages --nproc 2 --local-devices 2 $K --stage-timings \
  --out bench/multihost_kitti_n2_stages.json

# hypothesis (a): background load rides the free core in the 1-proc
# baseline — add a busy-loop antagonist to the 1-proc run; if its step
# time rises toward the 2-proc level, (a) explains the gap
run n1_antagonist --nproc 1 --local-devices 2 $K --antagonist \
  --out bench/multihost_kitti_n1_antagonist.json

# hypothesis (b): the per-process host-geometry pools oversubscribe the
# pinned cores — 2-proc with host_workers=1 (in-process geometry)
run n2_hw1 --nproc 2 --local-devices 2 $K --host-workers 1 \
  --out bench/multihost_kitti_n2_hw1.json

# fresh baselines with the same build (for ratios)
run n1_base --nproc 1 --local-devices 2 $K \
  --out bench/multihost_kitti_n1_r5.json
run n2_base --nproc 2 --local-devices 2 $K \
  --out bench/multihost_kitti_n2_r5.json

echo "=== multihost experiments done $(date +%T) ===" >> "$log"
