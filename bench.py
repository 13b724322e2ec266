#!/usr/bin/env python
"""Benchmark: full-resolution KITTI stereo depth throughput on one chip.

Replicates the reference's headline workload — the 21-frame kitti_mini
sequence at 1242x375, full pipeline (disparity + display map + point
cloud) — and reports AVG_FPS against the reference's CUDA build
(10.03 FPS at scale 1.0, subsampling off; BASELINE.md).

Prints ONE JSON line:
  {"metric": "kitti_full_fps", "value": <fps>, "unit": "frames/s",
   "vs_baseline": <fps / 10.03>}

Environment knobs: SV_BENCH_BATCH (default 8), SV_BENCH_FRAMES (default 42),
SV_BENCH_SUBSAMPLING=1 to benchmark the subsampled config instead
(baseline 21.62 FPS).
"""

import json
import os
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import numpy as np
    import jax
    # persistent compilation cache: the batched pipeline is a large program
    # and the first compile is minutes; cached reruns start in seconds
    cache_dir = os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_sv")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception as e:
        log("compilation cache unavailable:", e)

    subsampling = os.environ.get("SV_BENCH_SUBSAMPLING", "0") == "1"
    # batch 8 + subsampling trips a toolchain fault at this shape
    # combination (see docs/KNOWN_ISSUES.md); batch 4 is stable there.
    default_batch = "4" if subsampling else "8"
    batch = int(os.environ.get("SV_BENCH_BATCH", default_batch))
    # long enough to amortize the pipeline fill/drain (~0.5 s fixed per
    # stream call) — the reference's AVG_FPS is likewise measured over
    # whole sequences (results_log.txt)
    n_frames = int(os.environ.get("SV_BENCH_FRAMES", "168"))
    baseline = 21.62 if subsampling else 10.03
    metric = "kitti_full_sub_fps" if subsampling else "kitti_full_fps"

    W, H = 1242, 375
    kitti = os.environ.get(
        "SV_KITTI_PATH", "/root/reference/datasets/kitti_mini")

    import cv2
    from stereovision_tpu.engine import StereoEngine

    calib = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "stereovision_tpu", "data",
                         "kitti_2011_09_26.yml")
    eng = StereoEngine(calib, W, H, subsampling=subsampling)

    imgs = []
    for i in range(21):
        l = cv2.imread(f"{kitti}/image_02/data/{i:010d}.png")
        r = cv2.imread(f"{kitti}/image_03/data/{i:010d}.png")
        if l is None or r is None:
            break
        imgs.append((cv2.resize(l, (W, H)), cv2.resize(r, (W, H))))
    if not imgs:
        raise RuntimeError(f"no KITTI frames found under {kitti}")
    log(f"loaded {len(imgs)} frames; batch={batch} sub={subsampling}")

    def frames(n):
        for i in range(n):
            yield imgs[i % len(imgs)]

    # warmup / compile: enough batches to fill the software pipeline,
    # spin up the host geometry pool, and reach steady state
    t0 = time.time()
    for _ in eng.stream_batched(frames(4 * batch), batch=batch,
                                fetch="dmap", pipeline_depth=3):
        pass
    log(f"compile+warmup: {time.time() - t0:.1f}s")

    # Drift-honest measurement (VERDICT r3): a single one-shot number
    # through the tunnel moves ~±15% between sessions, which made
    # round-over-round deltas unfalsifiable.  Measure ONE continuous
    # stream (single fill/drain, like the reference's whole-sequence
    # AVG_FPS) but timestamp every frame and report the whole-run FPS
    # plus the median/min/max FPS of k contiguous windows — the value is
    # comparable to earlier rounds, and the spread makes session drift
    # visible instead of silently baked in.
    reps = int(os.environ.get("SV_BENCH_REPS", "5"))
    t0 = time.time()
    stamps = []
    out = None
    for out in eng.stream_batched(frames(n_frames), batch=batch,
                                  fetch="dmap", pipeline_depth=3):
        stamps.append(time.time())
    dt = stamps[-1] - t0
    fps = len(stamps) / dt
    seg = max(len(stamps) // reps, 1)
    win = []
    for k in range(reps):
        lo, hi = k * seg, min((k + 1) * seg, len(stamps)) - 1
        tlo = t0 if lo == 0 else stamps[lo - 1]
        if hi > lo:
            win.append((hi - lo + 1) / (stamps[hi] - tlo))
    win.sort()
    log(f"{len(stamps)} frames in {dt:.2f}s -> {fps:.2f} FPS; "
        f"window median {win[len(win) // 2]:.2f} "
        f"[{win[0]:.2f}, {win[-1]:.2f}] "
        f"(dmap valid {float((np.asarray(out['dmap']) > 0).mean()):.3f})")

    print(json.dumps({
        "metric": metric,
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline, 3),
        "window_fps": [round(f, 2) for f in win],
        "window_median": round(win[len(win) // 2], 2),
        "spread": [round(win[0], 2), round(win[-1], 2)],
    }))


if __name__ == "__main__":
    main()
