"""Wide-frame TPU worker fault bisect (docs/KNOWN_ISSUES.md, VERDICT r3 #1).

Scale-0.5 frames (2484x750) reproducibly crash the tunneled TPU worker
("kernel fault"), including with every r3 kernel gated back to the r2
configuration — so the fault is NOT attributable to the new kernels.  This
probe isolates WHICH stage kills the worker: the parent runs each pipeline
stage at the target shape in its own subprocess (the worker auto-restarts
between crashes) and prints a pass/fail matrix.

Usage:
  python scripts/fault_probe.py                      # all stages, 2484x750
  python scripts/fault_probe.py --width 1242 --height 375   # sanity run
  python scripts/fault_probe.py --stage matching_pl         # one stage
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

STAGES = ["h2d", "descriptor", "support_xla", "support_chunk",
          "matching_xla", "matching_pl", "matching_pair", "lr_pl",
          "ccl_pl", "post_xla", "tail_pallas", "full_pallas", "batch2"]


def fetch1(x):
    """Force completion under the axon tunnel (block_until_ready lies)."""
    import numpy as np
    return np.asarray(x.reshape(-1)[:1])


def run_stage(stage: str, W: int, H: int) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax_sv"))
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    from stereovision_tpu.params import app_params
    from stereovision_tpu.models.elas import ElasEngine

    kitti = os.environ.get("SV_KITTI_PATH",
                           "/root/reference/datasets/kitti_mini")
    lp = os.path.join(kitti, "image_02/data/0000000000.png")
    if os.path.exists(lp) and os.environ.get("SV_PROBE_RANDOM", "0") != "1":
        # real frames upscaled to the target shape — random noise makes the
        # CCL fixpoint pathologically slow (measured 180 s at 2484x750 vs
        # sub-second on real content), which would confound the bisect
        import cv2
        L = cv2.resize(cv2.imread(lp, cv2.IMREAD_GRAYSCALE), (W, H))
        R = cv2.resize(cv2.imread(os.path.join(
            kitti, "image_03/data/0000000000.png"),
            cv2.IMREAD_GRAYSCALE), (W, H))
    else:
        rng = np.random.default_rng(7)
        L = rng.integers(0, 255, (H, W), dtype=np.uint8)
        R = np.roll(L, -8, axis=1)
    p = app_params()

    t0 = time.perf_counter()
    if stage == "h2d":
        x = jnp.asarray(L)
        fetch1(x)
    elif stage == "descriptor":
        from stereovision_tpu.ops.descriptor import compute_descriptor
        d = jax.jit(compute_descriptor)(jnp.asarray(L))
        fetch1(d)
    elif stage in ("support_xla", "support_chunk"):
        from stereovision_tpu.ops.descriptor import compute_descriptor
        if stage == "support_chunk":
            os.environ["SV_CHUNK_SUPPORT"] = "1"
            from stereovision_tpu.ops.pallas import support_pl
            fn = support_pl.support_matches
        else:
            from stereovision_tpu.ops.support import support_matches as fn

        def go(I1, I2):
            return fn(compute_descriptor(I1), compute_descriptor(I2), p,
                      apply_filters=False)
        d_can = jax.jit(go)(jnp.asarray(L), jnp.asarray(R))
        fetch1(d_can)
    else:
        # stages needing real geometry: XLA stage A (proven separately)
        # + host middle, then the target dense component
        eng = ElasEngine(p, W, H, use_pallas=False)
        desc1, desc2, d_can = eng._stage_support(jnp.asarray(L),
                                                 jnp.asarray(R))
        fetch1(d_can)
        g = eng.host_mid(np.asarray(d_can))
        from stereovision_tpu.ops.grid import build_grid_mask
        from stereovision_tpu.ops.planes import fit_plane_tables
        from stereovision_tpu.ops.spans import expand_tri_spans
        from stereovision_tpu.ops import postprocess as post

        def prep(pts, tris_l, tris_r, tri_l, tri_r):
            pl_l, _ = fit_plane_tables(pts, tris_l)
            _, pl_r = fit_plane_tables(pts, tris_r)
            return (expand_tri_spans(tri_l, eng.Wo),
                    expand_tri_spans(tri_r, eng.Wo), pl_l, pl_r,
                    build_grid_mask(pts, p, W, H, right_image=False),
                    build_grid_mask(pts, p, W, H, right_image=True))

        args = tuple(jnp.asarray(g[k]) for k in
                     ("pts", "tris_l", "tris_r", "tri_l", "tri_r"))
        tri_l, tri_r, pl_l, pl_r, grid_l, grid_r = jax.jit(prep)(*args)
        fetch1(tri_l)
        t0 = time.perf_counter()

        if stage == "matching_xla":
            from stereovision_tpu.ops.matching import compute_disparity
            D1 = jax.jit(lambda *a: compute_disparity(
                *a, p, right_image=False))(desc1, desc2, tri_l, pl_l, grid_l)
            fetch1(D1)
        elif stage == "matching_pl":
            from stereovision_tpu.ops.pallas import matching_pl
            f = jax.jit(lambda *a: matching_pl.compute_disparity(
                *a, p, right_image=False))
            D1 = f(desc1, desc2, tri_l, pl_l, grid_l)
            fetch1(D1)
        elif stage == "matching_pair":
            # NOTE: the shared-SAD pair kernel was deleted in r4 (lost a
            # drift-controlled A/B, bench/ab_pair_r4.json); this stage now
            # measures compute_disparity_pair's two-pass delegate — i.e.
            # both dense passes back-to-back in one dispatch.
            from stereovision_tpu.ops.pallas import matching_pl
            f = jax.jit(lambda *a: matching_pl.compute_disparity_pair(
                *a, p))
            D1, D2 = f(desc1, desc2, tri_l, tri_r, pl_l, pl_r,
                       grid_l, grid_r)
            fetch1(D1)
        else:
            # run XLA matching once to get a realistic disparity input
            from stereovision_tpu.ops.matching import compute_disparity
            fm = jax.jit(lambda *a: compute_disparity(*a, p,
                                                      right_image=False))
            fmr = jax.jit(lambda *a: compute_disparity(*a, p,
                                                       right_image=True))
            D1 = fm(desc1, desc2, tri_l, pl_l, grid_l)
            D2 = fmr(desc2, desc1, tri_r, pl_r, grid_r)
            fetch1(D1)
            t0 = time.perf_counter()
            if stage == "lr_pl":
                from stereovision_tpu.ops.pallas import lr_pl
                D1c, D2c = jax.jit(
                    lambda a, b: lr_pl.lr_consistency_check(a, b, p))(D1, D2)
                fetch1(D1c)
            elif stage == "ccl_pl":
                from stereovision_tpu.ops.pallas import ccl_pl
                Ds = jax.jit(lambda a: ccl_pl.remove_small_segments(a, p))(D1)
                fetch1(Ds)
            elif stage == "post_xla":
                def tail(a):
                    a = post.gap_interpolation(a, p)
                    return post.adaptive_mean(a, p)
                Dp = jax.jit(tail)(D1)
                fetch1(Dp)
            elif stage == "tail_pallas":
                engp = ElasEngine(p, W, H, use_pallas=True)
                D1p, D2p = engp._stage_dense(desc1, desc2, *args)
                fetch1(D1p)
            elif stage == "full_pallas":
                engp = ElasEngine(p, W, H, use_pallas=True)
                D1p, D2p = engp.process(L, R)
                fetch1(D1p)
            elif stage == "batch2":
                from stereovision_tpu.engine import StereoEngine
                calib = os.path.join(ROOT, "stereovision_tpu", "data",
                                     "kitti_2011_09_26.yml")
                se = StereoEngine(calib, W, H, scale=1242.0 / W)
                frames = [(L, R)] * 4
                for _ in se.stream_batched(iter(frames), batch=2,
                                           fetch="dmap", pipeline_depth=1,
                                           host_workers="thread"):
                    pass
            else:
                raise ValueError(stage)
    return {"stage": stage, "ok": True,
            "secs": round(time.perf_counter() - t0, 2)}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=2484)
    ap.add_argument("--height", type=int, default=750)
    ap.add_argument("--stage", type=str, default="")
    ap.add_argument("--timeout", type=int, default=900)
    args = ap.parse_args(argv)

    if args.stage:
        try:
            res = run_stage(args.stage, args.width, args.height)
        except Exception as e:
            res = {"stage": args.stage, "ok": False,
                   "error": f"{type(e).__name__}: {e}"[:300]}
        print("PROBE " + json.dumps(res), flush=True)
        return 0 if res["ok"] else 1

    results = []
    for st in STAGES:
        cmd = [sys.executable, os.path.abspath(__file__), "--stage", st,
               "--width", str(args.width), "--height", str(args.height)]
        try:
            out = subprocess.run(cmd, cwd=ROOT, timeout=args.timeout,
                                 capture_output=True, text=True)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("PROBE ")]
            res = (json.loads(line[-1][6:]) if line else
                   {"stage": st, "ok": False,
                    "error": (out.stdout + out.stderr)[-300:]})
        except subprocess.TimeoutExpired:
            res = {"stage": st, "ok": False, "error": "timeout"}
        results.append(res)
        print(f"{st:15s} {'OK' if res['ok'] else 'FAIL'} "
              f"{res.get('secs', '')} {res.get('error', '')}", flush=True)
    print(json.dumps(results, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
