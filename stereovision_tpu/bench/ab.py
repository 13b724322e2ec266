"""Interleaved A/B benchmark harness.

Motivation (VERDICT r3): one-shot single-session measurements through the
axon tunnel drift by ~±15%, so round-over-round FPS deltas (12.26 vs
15.37) were unfalsifiable, and kernel A/Bs (the shared-SAD pair kernel)
could not be resolved.  This harness alternates the two configurations
SEGMENT-BY-SEGMENT within one process and one session — drift moves both
sides of every adjacent pair together, so the PAIRED differences isolate
the config effect from the drift.

Reported: per-segment FPS for both sides, median FPS each, the paired
per-pair deltas, their median, and a sign-test-style verdict (how many
pairs favor A vs B).  A config wins only if it wins in most adjacent
pairs AND the median paired delta is outside the pair spread.

Usage:
  python -m stereovision_tpu.bench.ab --mode batch --batches 4,8
  python -m stereovision_tpu.bench.ab --mode env --env-var "SV_X=0|1"
  python -m stereovision_tpu.bench.ab --mode self            # null A/B

First verdict delivered (r4): the shared-SAD pair kernel lost 4/5
adjacent pairs (median -1.11 FPS of ~11.4, bench/ab_pair_r4.json) and
was deleted — see matching_pl.compute_disparity_pair.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np


def _log(*a):
    print(*a, file=sys.stderr, flush=True)


def load_kitti(W: int, H: int, kitti: Optional[str] = None):
    import cv2
    kitti = kitti or os.environ.get("SV_KITTI_PATH",
                                    "/root/reference/datasets/kitti_mini")
    imgs = []
    for i in range(21):
        l = cv2.imread(f"{kitti}/image_02/data/{i:010d}.png")
        r = cv2.imread(f"{kitti}/image_03/data/{i:010d}.png")
        if l is None or r is None:
            break
        imgs.append((cv2.resize(l, (W, H)), cv2.resize(r, (W, H))))
    if not imgs:
        raise RuntimeError(f"no KITTI frames under {kitti}")
    return imgs


def measure_segment(eng, imgs, batch: int, n_frames: int,
                    pipeline_depth: int = 3) -> float:
    """One stream_batched pass over n_frames; returns FPS.  Both sides of
    an A/B carry the same fill/drain cost, so segments compare fairly."""
    def frames(n):
        for i in range(n):
            yield imgs[i % len(imgs)]
    t0 = time.perf_counter()
    n = 0
    for _ in eng.stream_batched(frames(n_frames), batch=batch,
                                fetch="dmap", pipeline_depth=pipeline_depth):
        n += 1
    return n / (time.perf_counter() - t0)


def interleaved_ab(build_a: Callable[[], Tuple[object, int]],
                   build_b: Callable[[], Tuple[object, int]],
                   imgs, seg_frames: int = 42, reps: int = 5,
                   label_a: str = "A", label_b: str = "B") -> dict:
    """Run reps adjacent (A, B) segment pairs, interleaved ABBA-style to
    cancel linear drift within each pair block.  build_* returns
    (engine, batch) and must fully warm the engine (the first measured
    segment must not compile)."""
    eng_a, batch_a = build_a()
    _log(f"[ab] warmed {label_a}")
    eng_b, batch_b = build_b()
    _log(f"[ab] warmed {label_b}")
    # warm both once more so pools/pipelines are hot right before timing
    measure_segment(eng_a, imgs, batch_a, 2 * batch_a)
    measure_segment(eng_b, imgs, batch_b, 2 * batch_b)

    fps_a: List[float] = []
    fps_b: List[float] = []
    for r in range(reps):
        # ABBA within alternating pair blocks: pair r uses order A,B when
        # r is even and B,A when odd — linear drift cancels across pairs
        order = ((eng_a, batch_a, fps_a, label_a),
                 (eng_b, batch_b, fps_b, label_b))
        if r % 2 == 1:
            order = order[::-1]
        for eng, batch, acc, lab in order:
            f = measure_segment(eng, imgs, batch, seg_frames)
            acc.append(f)
            _log(f"[ab] rep {r} {lab}: {f:.2f} FPS")

    deltas = [b - a for a, b in zip(fps_a, fps_b)]
    res = {
        "label_a": label_a, "label_b": label_b,
        "fps_a": [round(f, 2) for f in fps_a],
        "fps_b": [round(f, 2) for f in fps_b],
        "median_a": round(statistics.median(fps_a), 2),
        "median_b": round(statistics.median(fps_b), 2),
        "paired_delta_b_minus_a": [round(d, 2) for d in deltas],
        "median_delta": round(statistics.median(deltas), 2),
        "delta_spread": round(max(deltas) - min(deltas), 2),
        "pairs_favoring_b": sum(d > 0 for d in deltas),
        "reps": len(deltas),
    }
    wins = res["pairs_favoring_b"]
    n = res["reps"]
    if wins >= n - max(n // 5, 0) and res["median_delta"] > 0:
        res["verdict"] = f"{label_b} faster"
    elif wins <= max(n // 5, 0) and res["median_delta"] < 0:
        res["verdict"] = f"{label_a} faster"
    else:
        res["verdict"] = "no resolvable difference"
    return res


def median_fps(eng, imgs, batch: int, seg_frames: int = 42,
               reps: int = 5) -> dict:
    """Median-of-k segments for one config (the drift-honest headline
    measurement: VERDICT r3 #8)."""
    fps = [measure_segment(eng, imgs, batch, seg_frames)
           for _ in range(reps)]
    return {"fps_segments": [round(f, 2) for f in fps],
            "median_fps": round(statistics.median(fps), 2),
            "min_fps": round(min(fps), 2), "max_fps": round(max(fps), 2)}


def _engine(calib, W, H, subsampling, batch, imgs, env: dict = None):
    """Create + warm an engine under the given env overrides (flags read
    at trace time), restoring the environment afterwards."""
    from ..engine import StereoEngine
    saved = {}
    env = env or {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        eng = StereoEngine(calib, W, H, subsampling=subsampling)
        measure_segment(eng, imgs, batch, 3 * batch)   # compile + warm
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    return eng, batch


def main(argv=None):
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_sv"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", default="self",
                    choices=["batch", "self", "env"])
    ap.add_argument("--width", type=int, default=1242)
    ap.add_argument("--height", type=int, default=375)
    ap.add_argument("--sub", type=int, default=0)
    ap.add_argument("--batch", type=int, default=0,
                    help="0 = default (4 sub / 8 full)")
    ap.add_argument("--batches", default="4,8", help="mode=batch: A,B")
    ap.add_argument("--env-var", default="", help="mode=env: VAR=A|B")
    ap.add_argument("--seg-frames", type=int, default=42)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--out", default="")
    args = ap.parse_args(argv)

    sub = bool(args.sub)
    batch = args.batch or (4 if sub else 8)
    W, H = args.width, args.height
    calib = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data", "kitti_2011_09_26.yml")
    imgs = load_kitti(W, H)

    if args.mode == "batch":
        ba, bb = (int(x) for x in args.batches.split(","))
        res = interleaved_ab(
            lambda: _engine(calib, W, H, sub, ba, imgs),
            lambda: _engine(calib, W, H, sub, bb, imgs),
            imgs, args.seg_frames, args.reps,
            label_a=f"batch{ba}", label_b=f"batch{bb}")
    elif args.mode == "env":
        var, vals = args.env_var.split("=")
        va, vb = vals.split("|")
        res = interleaved_ab(
            lambda: _engine(calib, W, H, sub, batch, imgs, {var: va}),
            lambda: _engine(calib, W, H, sub, batch, imgs, {var: vb}),
            imgs, args.seg_frames, args.reps,
            label_a=f"{var}={va}", label_b=f"{var}={vb}")
    else:   # self: null A/B — calibrates the harness's noise floor
        res = interleaved_ab(
            lambda: _engine(calib, W, H, sub, batch, imgs),
            lambda: _engine(calib, W, H, sub, batch, imgs),
            imgs, args.seg_frames, args.reps,
            label_a="self-1", label_b="self-2")

    print(json.dumps(res, indent=1))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(res, f, indent=1)


if __name__ == "__main__":
    main()
